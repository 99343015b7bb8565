"""Likelihood and alignment loss tests (reference: tools/losses.py,
tools/gaussian_diffusion.py:1007-1057)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from vaw_tpu.core.losses import (
    compute_align_loss,
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
    projection_loss,
)


def test_normal_kl_zero_for_identical():
    m = jnp.array([0.3, -1.2])
    lv = jnp.array([0.1, -0.5])
    np.testing.assert_allclose(normal_kl(m, lv, m, lv), 0.0, atol=1e-7)


def test_normal_kl_closed_form():
    # KL(N(m1,v1) || N(0,1)) = 0.5 (v1 + m1^2 - 1 - log v1)
    m1, lv1 = 0.7, -0.3
    v1 = np.exp(lv1)
    expected = 0.5 * (v1 + m1 ** 2 - 1 - lv1)
    got = normal_kl(jnp.array(m1), jnp.array(lv1), 0.0, 0.0)
    assert float(got) == pytest.approx(expected, rel=1e-5)


def test_discretized_gaussian_sums_to_one():
    """Probabilities over all 256 uint8 buckets must sum to ~1."""
    buckets = (jnp.arange(256, dtype=jnp.float32) / 127.5) - 1.0
    means = jnp.zeros_like(buckets) + 0.1
    log_scales = jnp.full_like(buckets, -1.0)
    logp = discretized_gaussian_log_likelihood(
        buckets, means=means, log_scales=log_scales
    )
    total = float(jnp.sum(jnp.exp(logp)))
    assert total == pytest.approx(1.0, abs=1e-3)


def test_discretized_gaussian_matches_scipy_interior():
    x = jnp.array([0.0])
    means = jnp.array([0.05])
    log_scales = jnp.array([-2.0])
    logp = discretized_gaussian_log_likelihood(x, means=means, log_scales=log_scales)
    s = np.exp(-2.0)
    expected = np.log(
        stats.norm.cdf((0.0 + 1 / 255 - 0.05) / s)
        - stats.norm.cdf((0.0 - 1 / 255 - 0.05) / s)
    )
    assert float(logp[0]) == pytest.approx(expected, rel=1e-3)


def test_mean_flat():
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    np.testing.assert_allclose(mean_flat(x), x.reshape(2, -1).mean(axis=1))


def test_align_losses():
    rng = jax.random.key(0)
    t = jax.random.normal(rng, (2, 5, 8))
    o = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 8))
    # cosine of identical = -1
    assert float(compute_align_loss(t, t, "cosine")) == pytest.approx(-1.0, rel=1e-5)
    # mse of identical = 0
    assert float(compute_align_loss(t, t, "mse")) == 0.0
    assert float(compute_align_loss(t, t, "mse_l2")) == pytest.approx(0.0, abs=1e-10)
    # nt_xent of identical should be small (self-similarity dominates)
    self_loss = float(compute_align_loss(t, t, "nt_xent"))
    cross_loss = float(compute_align_loss(t, o, "nt_xent"))
    assert self_loss < cross_loss
    # projection_loss of identical = -1
    assert float(projection_loss(t, t)) == pytest.approx(-1.0, rel=1e-5)
    with pytest.raises(ValueError):
        compute_align_loss(t, o, "bogus")
