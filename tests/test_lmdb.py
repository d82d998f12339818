"""LMDB reader/writer roundtrip tests (including overflow pages and the
reference dataset key layout)."""

import os

import numpy as np
import pytest

from ccd_tpu.data import LmdbReader, LmdbWriter


def test_roundtrip_small(tmp_path):
    path = str(tmp_path / "db")
    with LmdbWriter(path) as w:
        w.put(b"alpha", b"1")
        w.put(b"beta", b"22")
        w.put(b"gamma", b"333")
    with LmdbReader(path) as r:
        assert len(r) == 3
        assert r.get(b"alpha") == b"1"
        assert r.get(b"beta") == b"22"
        assert r.get(b"gamma") == b"333"
        assert r.get(b"delta") is None
        assert dict(r.items()) == {b"alpha": b"1", b"beta": b"22", b"gamma": b"333"}


def test_roundtrip_reference_key_layout(tmp_path):
    # the reference dataset layout: image-%09d / label-%09d / num-samples
    path = str(tmp_path / "db")
    rng = np.random.default_rng(0)
    n = 500
    values = {}
    with LmdbWriter(path) as w:
        for i in range(1, n + 1):
            img = rng.bytes(rng.integers(100, 3000))  # JPEG-ish sizes
            w.put(f"image-{i:09d}".encode(), img)
            w.put(f"label-{i:09d}".encode(), f"word{i}".encode())
            values[i] = img
        w.put(b"num-samples", str(n).encode())
    with LmdbReader(path) as r:
        assert int(r.get(b"num-samples")) == n
        for i in (1, 2, 57, 499, 500):
            assert r.get(f"image-{i:09d}".encode()) == values[i]
            assert r.get(f"label-{i:09d}".encode()) == f"word{i}".encode()
        assert r.get(f"image-{n + 1:09d}".encode()) is None


def test_roundtrip_overflow_values(tmp_path):
    # values larger than a page must go to overflow pages
    path = str(tmp_path / "db")
    rng = np.random.default_rng(1)
    big1 = rng.bytes(5000)
    big2 = rng.bytes(70_000)
    with LmdbWriter(path) as w:
        w.put(b"big1", big1)
        w.put(b"small", b"x")
        w.put(b"big2", big2)
    with LmdbReader(path) as r:
        assert r.get(b"big1") == big1
        assert r.get(b"big2") == big2
        assert r.get(b"small") == b"x"


def test_roundtrip_many_entries_multilevel(tmp_path):
    # enough entries to force a multi-level B-tree
    path = str(tmp_path / "db")
    n = 20_000
    with LmdbWriter(path) as w:
        for i in range(n):
            w.put(f"key-{i:09d}".encode(), f"value-{i}".encode())
    with LmdbReader(path) as r:
        assert len(r) == n
        for i in (0, 1, 9999, 12345, n - 1):
            assert r.get(f"key-{i:09d}".encode()) == f"value-{i}".encode()
        # full scan is ordered and complete
        keys = [k for k, _ in r.items()]
        assert len(keys) == n
        assert keys == sorted(keys)


def test_unsorted_puts_and_overwrite(tmp_path):
    path = str(tmp_path / "db")
    with LmdbWriter(path) as w:
        w.put(b"z", b"1")
        w.put(b"a", b"2")
        w.put(b"m", b"3")
        w.put(b"a", b"overwritten")
    with LmdbReader(path) as r:
        assert r.get(b"a") == b"overwritten"
        assert [k for k, _ in r.items()] == [b"a", b"m", b"z"]


def test_real_lmdb_can_read_our_files(tmp_path):
    lmdb = pytest.importorskip("lmdb")
    path = str(tmp_path / "db")
    with LmdbWriter(path) as w:
        w.put(b"k", b"v")
        w.put(b"big", b"y" * 10_000)
    env = lmdb.open(path, readonly=True, lock=False)
    with env.begin() as txn:
        assert txn.get(b"k") == b"v"
        assert txn.get(b"big") == b"y" * 10_000


def test_native_reader_parity(tmp_path):
    from ccd_tpu.native import NativeLmdbReader, build
    if build() is None:
        pytest.skip("no compiler for native reader")
    path = str(tmp_path / "db")
    rng = np.random.default_rng(7)
    big = rng.bytes(50_000)
    with LmdbWriter(path) as w:
        for i in range(1, 2001):
            w.put(f"image-{i:09d}".encode(), rng.bytes(int(rng.integers(50, 4000))))
        w.put(b"num-samples", b"2000")
        w.put(b"big", big)
    py = LmdbReader(path)
    nat = NativeLmdbReader(path)
    assert len(nat) == len(py)
    assert nat.get(b"num-samples") == b"2000"
    assert nat.get(b"big") == big
    assert nat.get(b"missing") is None
    for i in (1, 999, 2000):
        k = f"image-{i:09d}".encode()
        assert nat.get(k) == py.get(k)
    nat.close(); py.close()


def test_native_reader_throughput(tmp_path):
    """Native get should not be slower than the pure-Python reader."""
    import time
    from ccd_tpu.native import NativeLmdbReader, build
    if build() is None:
        pytest.skip("no compiler for native reader")
    path = str(tmp_path / "db")
    rng = np.random.default_rng(8)
    with LmdbWriter(path) as w:
        for i in range(1, 5001):
            w.put(f"image-{i:09d}".encode(), rng.bytes(1000))
        w.put(b"num-samples", b"5000")
    keys = [f"image-{i:09d}".encode() for i in range(1, 5001)]

    def timed(reader):
        t0 = time.perf_counter()
        for k in keys:
            reader.get(k)
        return time.perf_counter() - t0

    py = LmdbReader(path)
    nat = NativeLmdbReader(path)
    t_py = timed(py)
    t_nat = timed(nat)
    py.close(); nat.close()
    assert t_nat < t_py, (t_nat, t_py)
