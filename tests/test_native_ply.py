"""Native (C++) PLY codec tests: parity with the numpy path + speed sanity."""

import time

import numpy as np
import pytest

from rtgs_tpu.io import native
from rtgs_tpu.io.ply import read_ply, write_ply


@pytest.mark.skipif(not native.available(), reason="native codec unavailable")
def test_deinterleave_matches_numpy(rng):
    n = 40_000  # above the native-path threshold (1 << 15)
    cols = {f"p{i}": rng.normal(size=n).astype(np.float32) for i in range(10)}
    cols["i64"] = rng.normal(size=n)  # float64 column exercises width 8
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as d:
        path = pathlib.Path(d) / "t.ply"
        write_ply(path, cols)
        back = read_ply(path)  # native path (n >= 2^15)
    for k, v in cols.items():
        np.testing.assert_array_equal(back[k], v)


@pytest.mark.skipif(not native.available(), reason="native codec unavailable")
def test_interleave_roundtrip(rng):
    n = 1000
    a = rng.normal(size=n).astype(np.float32)
    b = rng.normal(size=n).astype(np.float32)
    raw = native.interleave([a, b], 8, [0, 4], [4, 4])
    outs = native.deinterleave(raw, n, 8, [0, 4], [4, 4],
                               [np.float32, np.float32])
    np.testing.assert_array_equal(outs[0], a)
    np.testing.assert_array_equal(outs[1], b)
