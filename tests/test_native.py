"""Native (C++) fastsetup primitives vs numpy."""

import numpy as np

from tpufem.native import argsort_u64, have_native, unique_inverse_u64


def test_native_builds():
    assert have_native()


def test_argsort_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 1000, 100003):
        k = rng.integers(0, 1 << 48, n).astype(np.int64)
        p = argsort_u64(k)
        assert np.array_equal(k[p], np.sort(k))


def test_unique_inverse_matches_numpy():
    rng = np.random.default_rng(1)
    k = rng.integers(0, 5000, 100000).astype(np.int64)
    u1, i1 = unique_inverse_u64(k)
    u2, i2 = np.unique(k, return_inverse=True)
    assert np.array_equal(u1, u2)
    assert np.array_equal(u1[i1], k)
