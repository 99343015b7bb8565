"""Loss-weight golden tests for every weight_type x mean_type cell
(reference: tools/gaussian_diffusion.py:1092-1148; SURVEY.md section 4 item (b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaw_tpu.core import ModelMeanType, compute_mse_loss_weight
from vaw_tpu.core.weighting import (
    LossSecondMomentResampler,
    UniformSampler,
)


@pytest.fixture
def av():
    # alpha = sqrt(alpha_bar), sigma = sqrt(1-alpha_bar) over a spread of ts.
    alpha_bar = np.array([0.9999, 0.99, 0.5, 0.1, 0.001], dtype=np.float32)
    alpha = np.sqrt(alpha_bar)
    sigma = np.sqrt(1 - alpha_bar)
    t = np.arange(5)
    return jnp.asarray(t), jnp.asarray(alpha), jnp.asarray(sigma)


def snr_of(alpha, sigma):
    return (np.asarray(alpha) / np.asarray(sigma)) ** 2


def test_constant(av):
    t, a, s = av
    w = compute_mse_loss_weight(ModelMeanType.EPSILON, "constant", t, a, s)
    np.testing.assert_allclose(w, np.ones(5))


@pytest.mark.parametrize("k", [1.0, 5.0])
def test_epsilon_min_max_snr(av, k):
    t, a, s = av
    snr = snr_of(a, s)
    w = compute_mse_loss_weight(ModelMeanType.EPSILON, f"min_snr_{k}", t, a, s)
    np.testing.assert_allclose(w, np.minimum(snr, k) / snr, rtol=1e-6)
    w = compute_mse_loss_weight(ModelMeanType.EPSILON, f"max_snr_{k}", t, a, s)
    np.testing.assert_allclose(w, np.maximum(snr, k) / snr, rtol=1e-6)


def test_epsilon_family(av):
    t, a, s = av
    an, sn = np.asarray(a), np.asarray(s)
    snr = snr_of(a, s)
    cases = {
        "lambda": sn,
        "debias": sn / an,
        "p2": 1 / (1.0 + snr) ** 1.0,
        "min_debias": np.minimum(sn / an, 1.0),
        "max_debias": np.maximum(sn / an, 1.0),
    }
    for wt, expected in cases.items():
        w = compute_mse_loss_weight(ModelMeanType.EPSILON, wt, t, a, s)
        np.testing.assert_allclose(w, expected, rtol=1e-5, err_msg=wt)


def test_start_x_family(av):
    t, a, s = av
    an = np.asarray(a)
    snr = snr_of(a, s)
    cases = {
        "trunc_snr": np.maximum(snr, 1.0),
        "snr": snr,
        "inv_snr": 1.0 / snr,
        "min_snr_5.0": np.minimum(snr, 5.0),
        "max_snr_5.0": np.maximum(snr, 5.0),
        "lambda": an,
    }
    for wt, expected in cases.items():
        w = compute_mse_loss_weight(ModelMeanType.START_X, wt, t, a, s)
        np.testing.assert_allclose(w, expected, rtol=1e-4, err_msg=wt)


def test_velocity_family(av):
    t, a, s = av
    an, sn = np.asarray(a), np.asarray(s)
    snr = snr_of(a, s)
    w = compute_mse_loss_weight(ModelMeanType.VELOCITY, "min_snr_5.0", t, a, s)
    np.testing.assert_allclose(w, np.minimum(snr, 5.0) / (snr + 1), rtol=1e-5)
    w = compute_mse_loss_weight(ModelMeanType.VELOCITY, "lambda", t, a, s)
    np.testing.assert_allclose(w, an * sn, rtol=1e-6)


def test_vector_lambda(av):
    t, a, s = av
    w = compute_mse_loss_weight(ModelMeanType.VECTOR, "lambda", t, a, s)
    np.testing.assert_allclose(w, np.ones(5))


def test_snr_zero_guard():
    """At alpha=0 (snr=0) all weights collapse to 1.0 (reference :1147)."""
    t = jnp.arange(2)
    a = jnp.array([0.0, 0.5])
    s = jnp.array([1.0, 0.8660254])
    w = compute_mse_loss_weight(ModelMeanType.START_X, "snr", t, a, s)
    assert w[0] == 1.0


def test_invalid_weight_type_raises(av):
    t, a, s = av
    with pytest.raises(ValueError):
        compute_mse_loss_weight(ModelMeanType.VECTOR, "snr", t, a, s)


def test_uniform_sampler():
    s = UniformSampler(1000)
    t, w = s.sample(jax.random.key(0), 128)
    assert t.shape == (128,) and w.shape == (128,)
    assert (np.asarray(t) >= 0).all() and (np.asarray(t) < 1000).all()
    np.testing.assert_allclose(w, 1.0)


def test_loss_second_moment_resampler_warmup_and_weights():
    r = LossSecondMomentResampler(4, history_per_term=2)
    state = r.init_state()
    # Before warmup: uniform weights.
    np.testing.assert_allclose(r.weights(state), np.ones(4))
    # Fill the history: two losses per timestep.
    ts = jnp.array([0, 1, 2, 3, 0, 1, 2, 3])
    losses = jnp.array([1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0])
    state = r.update(state, ts, losses)
    w = np.asarray(r.weights(state))
    expected = np.array([1.0, 2.0, 3.0, 4.0])
    expected = expected / expected.sum()
    expected = expected * (1 - 0.001) + 0.001 / 4
    np.testing.assert_allclose(w, expected, rtol=1e-5)
    # Ring-buffer shift: a new loss at t=0 replaces the oldest.
    state = r.update(state, jnp.array([0]), jnp.array([9.0]))
    hist0 = np.asarray(state.loss_history[0])
    np.testing.assert_allclose(hist0, [1.0, 9.0])


def _sequential_ring_update(hist, counts, ts, losses, H):
    """The reference's per-item ring semantics (tools/resample.py:152-159),
    item by item in batch order — the oracle for the vectorized update."""
    hist, counts = hist.copy(), counts.copy()
    for t, loss in zip(ts, losses):
        if counts[t] == H:
            hist[t, :-1] = hist[t, 1:]
            hist[t, -1] = loss
        else:
            hist[t, counts[t]] = loss
            counts[t] += 1
    return hist, counts


@pytest.mark.parametrize("T,H,B", [
    (10, 3, 64),    # heavy collisions, k_t > H for some rows
    (1000, 10, 256),  # flagship shape: mostly 0-1 arrivals per row
    (4, 2, 33),     # tiny T, k_t >> H
    (7, 5, 5),      # partial fills only
])
def test_vectorized_update_matches_sequential_ring(T, H, B):
    r = LossSecondMomentResampler(T, history_per_term=H)
    rs = np.random.RandomState(42)
    hist = np.zeros((T, H), np.float32)
    counts = np.zeros((T,), np.int32)
    state = r.init_state()
    for round_i in range(3):  # multiple rounds: empty -> partial -> full rows
        ts = rs.randint(0, T, size=(B,)).astype(np.int32)
        losses = rs.rand(B).astype(np.float32) + 0.1
        hist, counts = _sequential_ring_update(hist, counts, ts, losses, H)
        state = jax.jit(r.update)(state, jnp.asarray(ts), jnp.asarray(losses))
        np.testing.assert_array_equal(np.asarray(state.loss_counts), counts)
        np.testing.assert_array_equal(np.asarray(state.loss_history), hist)
