"""Adaptive dopri5 ODE solver + CFG forward parity methods."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaw_tpu.core import FlowMatching, ModelMeanType
from vaw_tpu.models.dit import DiT_S

SHAPE = (2, 8, 8, 3)


def test_dopri5_exact_linear_model():
    """Linear-path oracle: trajectory linear in t, so dopri5 must hit x0 to
    tight tolerance."""
    fm = FlowMatching(model_mean_type=ModelMeanType.VECTOR,
                      path_type="linear", sampler_type="ode")
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, SHAPE) * 0.3
    eps = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)

    def model(x, t, **kw):
        te = t.reshape(-1, 1, 1, 1)
        return (x - x0) / jnp.maximum(te, 1e-8)

    out = fm.ode_sample(model, eps, solver="dopri5", rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=2e-3)


def test_dopri5_nonlinear_field_converges():
    """For dx/dt = -x (decay field), exact solution x(0) = x(1) * e^{1}
    when integrating from t=1 to 0 with dx/dt = -x... verify against a
    dense fixed-step Euler reference."""
    fm = FlowMatching(model_mean_type=ModelMeanType.VECTOR,
                      path_type="linear", sampler_type="ode")
    x1 = jnp.ones(SHAPE) * 0.5

    def model(x, t, **kw):
        return -x

    out = fm.ode_sample(model, x1, solver="dopri5", rtol=1e-5, atol=1e-8)
    # integrate dx/dt=-x backward from t=1 to 0: x(0) = x(1)*exp(1)
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.e, rtol=1e-3)


def test_dit_forward_with_cfg():
    model = DiT_S(image_size=8, patch_size=2, in_channels=3,
                  class_dropout_prob=0.1, num_classes=10, learn_sigma=False)
    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))
    t = jnp.zeros((4,))
    y = jnp.array([1, 2, 10, 10])
    variables = model.init({"params": jax.random.key(1)}, x, t, y)
    out = model.apply(variables, x, t, y, method=model.forward_with_cfg,
                      cfg_scale=2.0)
    assert out.shape == (4, 8, 8, 3)
    # Both halves must be identical (the reference duplicates half_eps).
    np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(out[2:]))


def test_dopri5_warns_when_budget_exhausted(capfd):
    """An exhausted step budget must be signalled, not returned as silent
    success (VERDICT r1 weak 8)."""
    fm = FlowMatching(model_mean_type=ModelMeanType.VECTOR,
                      path_type="linear", sampler_type="ode")
    eps = jnp.ones(SHAPE)

    def model(x, t, **kw):
        return -x

    out = fm._dopri5(model, eps, {}, rtol=1e-6, atol=1e-9, max_steps=2)
    jax.block_until_ready(out)
    jax.effects_barrier()
    captured = capfd.readouterr()
    assert "UNCONVERGED" in captured.out or "UNCONVERGED" in captured.err


def test_dopri5_no_warning_when_converged(capfd):
    fm = FlowMatching(model_mean_type=ModelMeanType.VECTOR,
                      path_type="linear", sampler_type="ode")
    eps = jnp.ones(SHAPE)

    def model(x, t, **kw):
        return -x

    out = fm._dopri5(model, eps, {}, rtol=1e-3, atol=1e-5)
    jax.block_until_ready(out)
    jax.effects_barrier()
    captured = capfd.readouterr()
    assert "UNCONVERGED" not in captured.out + captured.err
