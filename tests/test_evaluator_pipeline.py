"""Full Evaluator orchestration with a fake feature backend (the TF1
InceptionV3 graph needs a local .pb; the orchestration — activations,
statistics, IS, P/R, npz reading, CSV metrics — is validated end to end
without it)."""

import numpy as np
import pytest

import vaw_tpu.evals.evaluator as eval_mod
from vaw_tpu.utils.logging import save_metrics_to_csv


class FakeBackend:
    """Deterministic random-projection 'Inception': features = x @ W."""

    def __init__(self, pool_dim=32, spatial_dim=14):
        rs = np.random.RandomState(0)
        self.w = None
        self.pool_dim = pool_dim
        self.spatial_dim = spatial_dim
        self.softmax_batch_size = 512

    def features(self, batch):
        flat = batch.reshape(len(batch), -1).astype(np.float64)
        if self.w is None:
            rs = np.random.RandomState(0)
            self.w = rs.randn(flat.shape[1], self.pool_dim) / np.sqrt(
                flat.shape[1])
            self.ws = rs.randn(flat.shape[1], self.spatial_dim) / np.sqrt(
                flat.shape[1])
        return (flat @ self.w).astype(np.float32), (flat @ self.ws).astype(
            np.float32)

    def softmax_probs(self, pool):
        logits = pool[:, :10] / 100.0  # keep probs non-degenerate
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)


@pytest.fixture
def evaluator(monkeypatch):
    ev = eval_mod.Evaluator.__new__(eval_mod.Evaluator)
    ev.batch_size = 16
    ev.backend = FakeBackend()
    from vaw_tpu.evals.fid import ManifoldEstimator

    ev.manifold_estimator = ManifoldEstimator(row_batch_size=64,
                                              col_batch_size=64)
    return ev


def _batch(seed, n=64):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 255, (n, 8, 8, 3), np.uint8)


def test_full_metrics_pipeline(evaluator, tmp_path):
    ref = _batch(0, 128)
    samples = _batch(1, 128)

    ref_npz = str(tmp_path / "ref.npz")
    np.savez(ref_npz, ref)
    ref_acts = evaluator.read_activations(ref_npz)
    assert ref_acts[0].shape == (128, 32)
    assert ref_acts[1].shape == (128, 14)

    ref_stats, ref_stats_spatial = evaluator.read_statistics(ref_npz, ref_acts)

    sample_batches = [samples[i: i + 16] for i in range(0, 128, 16)]
    sample_acts = evaluator.compute_activations(sample_batches)
    sample_stats = evaluator.compute_statistics(sample_acts[0])
    sample_stats_spatial = evaluator.compute_statistics(sample_acts[1])

    fid = sample_stats.frechet_distance(ref_stats)
    sfid = sample_stats_spatial.frechet_distance(ref_stats_spatial)
    assert fid >= 0 and sfid >= 0
    # Same distribution -> small FID; identical batch -> ~0.
    self_stats = evaluator.compute_statistics(ref_acts[0])
    assert self_stats.frechet_distance(ref_stats) == pytest.approx(0, abs=1e-4)

    is_score = evaluator.compute_inception_score(sample_acts[0])
    assert is_score >= 1.0

    prec, rec = evaluator.compute_prec_recall(ref_acts[0], sample_acts[0])
    assert 0 <= prec <= 1 and 0 <= rec <= 1
    # Same-distribution batches should overlap heavily.
    assert prec > 0.5 and rec > 0.5

    # metrics.csv artifact (reference: tools/utils.py:190-201).
    save_metrics_to_csv(str(tmp_path), {
        "IS (EMA)": is_score, "FID (EMA)": fid, "sFID (EMA)": sfid,
        "Pre. (EMA)": prec, "Rec. (EMA)": rec,
    }, step=100)
    lines = open(tmp_path / "metrics.csv").read().splitlines()
    assert lines[0].startswith("Step,IS (EMA),FID (EMA)")
    assert lines[1].startswith("100,")


def test_precomputed_mu_sigma_npz(evaluator, tmp_path):
    """VIRTUAL_*.npz files carry precomputed stats
    (reference: evaluations/evaluator.py:165-172)."""
    rs = np.random.RandomState(2)
    path = str(tmp_path / "virtual.npz")
    np.savez(path, mu=rs.randn(32), sigma=np.eye(32),
             mu_s=rs.randn(14), sigma_s=np.eye(14),
             arr_0=_batch(3, 10))
    stats, stats_s = evaluator.read_statistics(path, None)
    assert stats.mu.shape == (32,)
    assert stats_s.sigma.shape == (14, 14)