"""Native batch-assembly library: builds with g++, matches the numpy
reference exactly, and survives fallback."""

import numpy as np
import pytest

from vaw_tpu.runtime import gather_normalize, native_available, normalize_u8


def _numpy_reference(images, idx, flips):
    out = images[idx]
    if flips is not None:
        out = np.where(flips.astype(bool)[:, None, None, None],
                       out[:, :, ::-1], out)
    return out.astype(np.float32) / 127.5 - 1.0


def test_native_builds():
    assert native_available(), "g++ compile of batch_ops.cpp must succeed"


def test_gather_normalize_matches_numpy():
    rs = np.random.RandomState(0)
    images = rs.randint(0, 256, (32, 8, 8, 3), np.uint8)
    idx = rs.permutation(32)[:16]
    flips = (rs.rand(16) < 0.5).astype(np.uint8)
    out = gather_normalize(images, idx, flips)
    expected = _numpy_reference(images, idx, flips)
    np.testing.assert_array_equal(out, expected)


def test_gather_normalize_no_flips():
    rs = np.random.RandomState(1)
    images = rs.randint(0, 256, (10, 4, 4, 1), np.uint8)
    idx = np.array([9, 0, 5])
    out = gather_normalize(images, idx, None)
    np.testing.assert_array_equal(out, _numpy_reference(images, idx, None))


def test_normalize_u8():
    rs = np.random.RandomState(2)
    x = rs.randint(0, 256, (3, 5, 5, 3), np.uint8)
    np.testing.assert_array_equal(
        normalize_u8(x), x.astype(np.float32) / 127.5 - 1.0
    )
    # large array exercises the threaded path
    big = rs.randint(0, 256, (1 << 17,), np.uint8)
    np.testing.assert_array_equal(
        normalize_u8(big), big.astype(np.float32) / 127.5 - 1.0
    )


def test_threaded_matches_single():
    rs = np.random.RandomState(3)
    images = rs.randint(0, 256, (64, 8, 8, 3), np.uint8)
    idx = rs.permutation(64)
    flips = (rs.rand(64) < 0.5).astype(np.uint8)
    out1 = gather_normalize(images, idx, flips, num_threads=1)
    out8 = gather_normalize(images, idx, flips, num_threads=8)
    np.testing.assert_array_equal(out1, out8)
