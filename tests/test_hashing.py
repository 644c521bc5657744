import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from legislation_scraper_ray.functions.hashing import (
    canonicalize_urls,
    extract_hosts,
    fnv1a64_bytes,
    hash64,
)


def test_vectorized_matches_scalar():
    strs = ["", "a", "ab", "https://host0.legis.example/doc/1990/lei/valid/0", "x" * 300, "áéç"]
    out = hash64(strs)
    for s, h in zip(strs, out):
        assert int(h) == fnv1a64_bytes(s.encode("utf-8"))


@given(st.lists(st.text(max_size=80), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_vectorized_matches_scalar_property(strs):
    out = hash64(strs)
    for s, h in zip(strs, out):
        assert int(h) == fnv1a64_bytes(s.encode("utf-8"))


def test_no_trivial_collisions():
    urls = [f"https://h{i % 7}.x/doc/{i}" for i in range(100_000)]
    out = hash64(urls)
    assert len(np.unique(out)) == len(urls)


def test_binary_input():
    arr = pa.array([b"abc", b"", b"\x00\x01"], type=pa.binary())
    out = hash64(arr)
    assert int(out[0]) == fnv1a64_bytes(b"abc")
    assert int(out[2]) == fnv1a64_bytes(b"\x00\x01")


def test_canonicalize_rules():
    raw = pa.array(
        [
            "HTTP://Host.X/a/#frag",
            "https://h:443/x/",
            "http://h:80/y",
            "https://h/a/B//",
            "https://h/path?q=1&r=2",
        ]
    )
    out = canonicalize_urls(raw).to_pylist()
    assert out == [
        "http://host.x/a",
        "https://h/x",
        "http://h/y",
        "https://h/a/B",
        "https://h/path?q=1&r=2",
    ]


def test_canonicalize_idempotent():
    raw = pa.array(
        ["HTTPS://A.B/c/", "https://a.b:443/c#f", "https://a.b/c?x=1", "http://q/", "weird"]
    )
    once = canonicalize_urls(raw)
    twice = canonicalize_urls(once)
    assert once.to_pylist() == twice.to_pylist()


def test_extract_hosts():
    out = extract_hosts(pa.array(["https://host0.x/a/b", "http://h:8080/", "nourl"]))
    assert out.to_pylist() == ["host0.x", "h:8080", None]


def test_hash64_pair_first_matches_hash64_and_second_independent():
    """hash64_pair's first hash IS hash64 (same basis, same sweep); the second
    basis must disagree with the first on every test string (independence for
    the 128-bit exact-dedup composite key), and both must be deterministic."""
    import numpy as np

    from legislation_scraper_ray.functions.hashing import hash64, hash64_pair

    strs = ["", "a", "ab", "hello world", "x" * 200, "Hello", "hellp"]
    h1, h2 = hash64_pair(strs)
    assert (h1 == hash64(strs)).all()
    assert (h1 != h2).all()
    h1b, h2b = hash64_pair(strs)
    assert (h1 == h1b).all() and (h2 == h2b).all()
    # distinct strings stay distinct under BOTH bases
    assert len(np.unique(h2)) == len(strs)
