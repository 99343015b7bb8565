"""Differential parity of the metrics MATH vs the reference evaluator
(reference: evaluations/evaluator.py) on synthetic activations: Frechet
distance, inception-score split math, and the improved-precision-recall
ManifoldEstimator (reference k-NN radii via its TF DistanceBlock on CPU vs
our jitted matmul distance blocks). The InceptionV3 FEATURE parity is
gated on the frozen graph (test_tf_graph.py); this file seals everything
downstream of the features."""

import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow").compat.v1
tf.disable_eager_execution()

sys.path.insert(0, "tests")

from vaw_tpu.evals.fid import (  # noqa: E402
    FIDStatistics,
    ManifoldEstimator,
    compute_inception_score_from_probs,
    compute_statistics,
)


def _load_ref_evaluator_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_evaluator", "/root/reference/evaluations/evaluator.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_frechet_distance_parity():
    ref = _load_ref_evaluator_module()
    rs = np.random.RandomState(0)
    a = rs.randn(300, 24).astype(np.float64)
    b = (rs.randn(300, 24) * 1.3 + 0.2).astype(np.float64)

    r1 = ref.FIDStatistics(a.mean(0), np.cov(a, rowvar=False))
    r2 = ref.FIDStatistics(b.mean(0), np.cov(b, rowvar=False))
    o1 = compute_statistics(a)
    o2 = compute_statistics(b)
    np.testing.assert_allclose(o1.frechet_distance(o2),
                               r1.frechet_distance(r2), rtol=1e-8)
    # identical sets -> ~0 on both
    assert abs(o1.frechet_distance(FIDStatistics(o1.mu, o1.sigma))) < 1e-6


def test_inception_score_split_math_parity():
    """The reference IS loop (evaluator.py:180-193) given softmax probs —
    replicated verbatim here as the oracle — vs our
    compute_inception_score_from_probs, incl. the multi-split mean."""
    rs = np.random.RandomState(1)
    logits = rs.randn(12_000, 8).astype(np.float64)
    preds = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)

    split_size = 5000
    scores = []
    for i in range(0, len(preds), split_size):
        part = preds[i: i + split_size]
        kl = part * (np.log(part) - np.log(np.expand_dims(
            np.mean(part, 0), 0)))
        kl = np.mean(np.sum(kl, 1))
        scores.append(np.exp(kl))
    ref_is = float(np.mean(scores))

    ours = compute_inception_score_from_probs(preds, split_size=split_size)
    np.testing.assert_allclose(ours, ref_is, rtol=1e-10)


def test_manifold_precision_recall_parity():
    """Reference ManifoldEstimator (TF DistanceBlock on CPU,
    evaluator.py:206-412) vs our jitted-matmul estimator on the same
    synthetic activations: k-NN radii and the final (precision, recall)."""
    ref = _load_ref_evaluator_module()
    rs = np.random.RandomState(2)
    feats_ref = rs.randn(256, 16).astype(np.float32)
    feats_smp = (rs.randn(256, 16) * 1.1 + 0.3).astype(np.float32)

    with tf.Session(graph=tf.Graph()) as sess:
        rme = ref.ManifoldEstimator(sess, row_batch_size=100,
                                    col_batch_size=100)
        r_rad1 = rme.manifold_radii(feats_ref)
        r_rad2 = rme.manifold_radii(feats_smp)
        r_pr = rme.evaluate_pr(feats_ref, r_rad1, feats_smp, r_rad2)
        r_pre, r_rec = float(r_pr[0][0]), float(r_pr[1][0])

    ome = ManifoldEstimator(row_batch_size=100, col_batch_size=100)
    o_rad1 = ome.manifold_radii(feats_ref)
    o_rad2 = ome.manifold_radii(feats_smp)
    # The reference DistanceBlock computes in FLOAT16 (f32 only on
    # overflow, evaluator.py:377-385); our blocks are f32. Radii agree up
    # to f16 quantization; the final P/R fractions may differ by a few
    # boundary flips out of 256 points.
    np.testing.assert_allclose(o_rad1, r_rad1, rtol=3e-3, atol=0.08)
    np.testing.assert_allclose(o_rad2, r_rad2, rtol=3e-3, atol=0.08)
    o_pr = ome.evaluate_pr(feats_ref, o_rad1, feats_smp, o_rad2)
    o_pre, o_rec = float(o_pr[0][0]), float(o_pr[1][0])
    assert o_pre == pytest.approx(r_pre, abs=0.03)
    assert o_rec == pytest.approx(r_rec, abs=0.03)

    # Exact algorithmic parity, f16 noise removed: a float64 numpy oracle
    # of the reference algorithm (k-NN radii via partition at
    # seq[nhood_sizes], any-point-within-radius P/R).
    def oracle_radii(f):
        d = ((f[:, None, :].astype(np.float64)
              - f[None, :, :].astype(np.float64)) ** 2).sum(-1)
        part = np.partition(d, 3, axis=1)
        return part[:, [3]]

    def oracle_pr(f1, rad1, f2, rad2):
        d = ((f1[:, None, :].astype(np.float64)
              - f2[None, :, :].astype(np.float64)) ** 2).sum(-1)
        # precision: sample points inside ANY ref hypersphere
        prec = (d <= rad1).any(axis=0).mean()
        rec = (d <= rad2.T).any(axis=1).mean()
        return prec, rec

    e_rad1 = oracle_radii(feats_ref)
    e_rad2 = oracle_radii(feats_smp)
    np.testing.assert_allclose(o_rad1, e_rad1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(o_rad2, e_rad2, rtol=1e-5, atol=1e-4)
    e_pre, e_rec = oracle_pr(feats_ref, e_rad1, feats_smp, e_rad2)
    assert o_pre == pytest.approx(float(e_pre), abs=1e-6)
    assert o_rec == pytest.approx(float(e_rec), abs=1e-6)
