"""Metrics-stack tests on synthetic features (no Inception graph needed):
FID closed forms, IS bounds, precision/recall limiting cases, pairwise
distances vs scipy, streaming npz reader."""

import numpy as np
import pytest
from scipy.spatial.distance import cdist

from vaw_tpu.evals.fid import (
    FIDStatistics,
    ManifoldEstimator,
    compute_inception_score_from_probs,
    compute_statistics,
    pairwise_sq_distances,
)
from vaw_tpu.evals.npz_reader import open_npz_array


def test_frechet_distance_identical_is_zero():
    rs = np.random.RandomState(0)
    acts = rs.randn(500, 16)
    s = compute_statistics(acts)
    assert s.frechet_distance(s) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_mean_shift_closed_form():
    """Identical covariance, shifted mean: FID = |mu1 - mu2|^2."""
    rs = np.random.RandomState(1)
    acts = rs.randn(2000, 8)
    s1 = compute_statistics(acts)
    shift = np.full(8, 0.5)
    s2 = FIDStatistics(s1.mu + shift, s1.sigma)
    assert s1.frechet_distance(s2) == pytest.approx(
        float(shift @ shift), rel=1e-4
    )


def test_frechet_distance_diagonal_closed_form():
    """Diagonal Gaussians: FID = |dmu|^2 + sum (sqrt(v1)-sqrt(v2))^2."""
    mu1, mu2 = np.zeros(4), np.ones(4) * 0.3
    v1, v2 = np.full(4, 2.0), np.full(4, 0.5)
    s1 = FIDStatistics(mu1, np.diag(v1))
    s2 = FIDStatistics(mu2, np.diag(v2))
    expected = 0.09 * 4 + np.sum((np.sqrt(v1) - np.sqrt(v2)) ** 2)
    assert s1.frechet_distance(s2) == pytest.approx(expected, rel=1e-6)


def test_inception_score_bounds():
    # One-hot over 10 classes, uniform marginal -> IS = 10.
    preds = np.eye(10)[np.arange(100) % 10] * (1 - 1e-9) + 1e-10
    assert compute_inception_score_from_probs(preds) == pytest.approx(
        10.0, rel=1e-3
    )
    # Constant predictions -> IS = 1.
    preds = np.full((100, 10), 0.1)
    assert compute_inception_score_from_probs(preds) == pytest.approx(1.0)


def test_pairwise_sq_distances_matches_scipy():
    rs = np.random.RandomState(2)
    u, v = rs.randn(50, 16).astype(np.float32), rs.randn(30, 16).astype(np.float32)
    d = np.asarray(pairwise_sq_distances(u, v))
    expected = cdist(u, v, "sqeuclidean")
    np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-4)


def test_manifold_radii_knn_semantics():
    """Radius = distance to the k-th nearest neighbor (k=3 default,
    self-distance included as the 0th)."""
    rs = np.random.RandomState(3)
    feats = rs.randn(64, 8).astype(np.float32)
    est = ManifoldEstimator(row_batch_size=16, col_batch_size=16)
    radii = est.manifold_radii(feats)
    full = cdist(feats, feats, "sqeuclidean")
    expected = np.sort(full, axis=1)[:, 3]
    np.testing.assert_allclose(radii[:, 0], expected, rtol=1e-3, atol=1e-3)


def test_precision_recall_identical_sets():
    rs = np.random.RandomState(4)
    feats = rs.randn(128, 8).astype(np.float32)
    est = ManifoldEstimator(row_batch_size=32, col_batch_size=32)
    radii = est.manifold_radii(feats)
    prec, rec = est.evaluate_pr(feats, radii, feats, radii)
    assert prec[0] == pytest.approx(1.0)
    assert rec[0] == pytest.approx(1.0)


def test_precision_recall_disjoint_sets():
    rs = np.random.RandomState(5)
    a = rs.randn(64, 8).astype(np.float32)
    b = rs.randn(64, 8).astype(np.float32) + 100.0
    est = ManifoldEstimator(row_batch_size=32, col_batch_size=32)
    ra, rb = est.manifold_radii(a), est.manifold_radii(b)
    prec, rec = est.evaluate_pr(a, ra, b, rb)
    assert prec[0] == 0.0 and rec[0] == 0.0


def test_npz_streaming_reader(tmp_path):
    rs = np.random.RandomState(6)
    arr = rs.randint(0, 255, size=(37, 4, 4, 3), dtype=np.uint8)
    path = str(tmp_path / "batch.npz")
    np.savez(path, arr)
    with open_npz_array(path, "arr_0") as reader:
        batches = list(reader.read_batches(10))
    assert [len(b) for b in batches] == [10, 10, 10, 7]
    np.testing.assert_array_equal(np.concatenate(batches), arr)
