"""CLI surface regression: crawl → query → consolidate as subprocesses (each
owns its own local Ray session, independent of the conftest fixture)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):  # generous: the box is multi-tenant (CLAUDE.md)
    return subprocess.run(
        [sys.executable, "-m", "legislation_scraper_ray.cli", *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
    )


@pytest.mark.usefixtures("ray_session")  # ensures the t1 corpus fixture exists
def test_cli_crawl_query_consolidate(tmp_path):
    from legislation_scraper_ray.sources.corpus import generate

    corpus = generate("t1")
    out = str(tmp_path / "crawl")
    r = _run(["crawl", "--scale", "t1", "--out", out, "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["docs_written"] == 200 and summary["fetched_ok"] == 226

    r = _run(["query", "counts_by_lang_source", "--sf-dir", "/root/testdata/sf0.001"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "rows" in r.stdout.splitlines()[-1]

    final = str(tmp_path / "final")
    r = _run(["consolidate", "--crawl-out", out, "--corpus-dir", corpus,
              "--out", final])
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["rows"] == 200
