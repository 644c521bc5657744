"""Lance-or-parquet table IO.

The north-star corpus format is a Lance table of image + caption pairs
(``image_id, bytes, w, h, fmt, caption, phash``).  Ray Data ships native
``read_lance`` / ``write_lance`` (both column- and fragment-pruned, so the
"prune at the read" rule holds identically), but the Lance runtime
(``pylance``) is not in this container — so every corpus path in the engine
goes through this adapter, which dispatches on the table's on-disk format
and degrades EXPLICITLY (an actionable ImportError), never silently.

On a cluster with ``pylance`` installed, pointing any pipeline at a
``*.lance`` dataset directory Just Works; in this sandbox the deterministic
generators emit the same schema as parquet and the adapter routes there.
Both branches return a lazy ``ray.data.Dataset`` with identical schema, so
nothing downstream can tell the formats apart.
"""

from __future__ import annotations

import os

import ray.data as rd


def have_lance() -> bool:
    """True when the Lance runtime (pylance) is importable."""
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def is_lance_path(path: str) -> bool:
    """A Lance dataset is a directory ``<name>.lance/`` holding ``_versions``
    manifests + ``data/*.lance`` fragments; parquet is ``*.parquet`` files or
    directories of them."""
    if path.rstrip("/").endswith(".lance"):
        return True
    return os.path.isdir(path) and (
        os.path.isdir(os.path.join(path, "_versions"))
        or os.path.isdir(os.path.join(path, "_latest.manifest"))
    )


def read_table(path: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """Lazy Dataset over a Lance dataset or parquet file/directory, with
    column pruning pushed into the scan either way."""
    if is_lance_path(path):
        if not have_lance():
            raise ImportError(
                f"{path} is a Lance dataset but the Lance runtime is not "
                "installed in this environment (`pip install pylance`); the "
                "sandbox corpora are parquet stand-ins with the same schema"
            )
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: rd.Dataset, path: str, fmt: str | None = None, **kwargs) -> None:
    """Write a Dataset as Lance (``fmt='lance'`` or a ``*.lance`` path) or
    partitioned parquet (default).  Distributed, streaming writes both ways."""
    fmt = fmt or ("lance" if path.rstrip("/").endswith(".lance") else "parquet")
    if fmt == "lance":
        if not have_lance():
            raise ImportError(
                f"cannot write Lance dataset {path}: the Lance runtime is "
                "not installed (`pip install pylance`); pass fmt='parquet' "
                "or a non-.lance path for the parquet stand-in"
            )
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
