"""Flow-matching invariants: interpolants, conversion consistency,
exact-model ODE recovery, training losses."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaw_tpu.core import FlowMatching, ModelMeanType
from vaw_tpu.core.flow import interpolant

SHAPE = (4, 8, 8, 3)


@pytest.mark.parametrize("path", ["linear", "cosine", "linear_logsnr"])
def test_interpolant_derivatives(path):
    """d_alpha/d_sigma must match numerical derivatives of alpha/sigma."""
    t = jnp.linspace(0.05, 0.95, 7)
    h = 1e-3
    a, s, da, ds = interpolant(path, t)
    a2, s2, _, _ = interpolant(path, t + h)
    a1, s1, _, _ = interpolant(path, t - h)
    np.testing.assert_allclose(da, (a2 - a1) / (2 * h), atol=5e-3)
    np.testing.assert_allclose(ds, (s2 - s1) / (2 * h), atol=5e-3)


@pytest.mark.parametrize("path", ["linear", "cosine"])
def test_interpolant_boundary(path):
    a0, s0, _, _ = interpolant(path, jnp.array(0.0))
    a1, s1, _, _ = interpolant(path, jnp.array(1.0))
    assert float(a0) == pytest.approx(1.0)
    assert float(s0) == pytest.approx(0.0, abs=1e-7)
    assert float(a1) == pytest.approx(0.0, abs=1e-7)
    assert float(s1) == pytest.approx(1.0)


@pytest.mark.parametrize(
    "mean_type",
    [ModelMeanType.START_X, ModelMeanType.EPSILON, ModelMeanType.VELOCITY,
     ModelMeanType.VECTOR],
)
def test_vector_conversion_consistency(mean_type):
    """Feeding the exact target of any mean type into
    convert_model_output_to_vector must yield the true vector field."""
    fm = FlowMatching(model_mean_type=mean_type, path_type="cosine")
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, SHAPE)
    eps = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    t = jnp.full((SHAPE[0],), 0.3)
    te = t.reshape(-1, 1, 1, 1)
    x_t = fm.q_sample(x0, eps, t)
    target = fm.compute_target(x0, eps, t)
    _, _, da, ds = interpolant("cosine", te)
    true_vector = da * x0 + ds * eps
    vec = fm.convert_model_output_to_vector(target, x_t, te)
    np.testing.assert_allclose(vec, true_vector, atol=1e-4)


@pytest.mark.parametrize(
    "mean_type",
    [ModelMeanType.START_X, ModelMeanType.EPSILON, ModelMeanType.VELOCITY,
     ModelMeanType.VECTOR, ModelMeanType.SCORE],
)
def test_score_conversion_consistency(mean_type):
    fm = FlowMatching(model_mean_type=mean_type, path_type="cosine")
    rng = jax.random.key(1)
    x0 = jax.random.normal(rng, SHAPE)
    eps = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    t = jnp.full((SHAPE[0],), 0.4)
    te = t.reshape(-1, 1, 1, 1)
    x_t = fm.q_sample(x0, eps, t)
    target = fm.compute_target(x0, eps, t)
    _, sigma, _, _ = interpolant("cosine", te)
    true_score = -eps / sigma
    score = fm.convert_model_output_to_score(target, x_t, te)
    np.testing.assert_allclose(score, true_score, atol=1e-4)


def test_ode_exact_linear_model_recovers_x0():
    """Linear path + oracle vector model: Euler integration is exact, so the
    ODE sampler must map eps to x0."""
    fm = FlowMatching(model_mean_type=ModelMeanType.VECTOR, path_type="linear",
                      sampler_type="ode")
    rng = jax.random.key(2)
    x0 = jax.random.normal(rng, SHAPE) * 0.3
    eps = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)

    def model(x, t, **kw):
        # Exact vector for linear path: v = eps - x0 = (x - x0) / t.
        te = t.reshape(-1, 1, 1, 1)
        return (x - x0) / jnp.maximum(te, 1e-8)

    out = fm.ode_sample(model, eps, num_steps=8, solver="euler")
    np.testing.assert_allclose(out, x0, atol=1e-4)


def test_sde_sampler_shapes_and_finite():
    fm = FlowMatching(model_mean_type=ModelMeanType.VECTOR, path_type="linear",
                      sampler_type="sde")
    rng = jax.random.key(3)
    eps = jax.random.normal(rng, SHAPE)

    def model(x, t, **kw):
        return -x  # arbitrary smooth field

    for solver in ["euler", "heun"]:
        out = fm.sde_sample(model, jax.random.fold_in(rng, 1), eps,
                            num_steps=6, solver=solver)
        assert out.shape == SHAPE
        assert np.isfinite(np.asarray(out)).all()


def test_training_losses_and_time_dist():
    fm = FlowMatching(
        model_mean_type=ModelMeanType.VECTOR, path_type="linear",
        weight_type="lambda", time_dist=("lognorm", -0.8, 0.8),
    )
    rng = jax.random.key(4)
    t = fm.sample_t(rng, 512)
    assert ((np.asarray(t) > 0) & (np.asarray(t) < 1)).all()
    # logit-normal median is sigmoid(mu).
    assert abs(np.median(np.asarray(t)) - 1 / (1 + math.exp(0.8))) < 0.1

    x0 = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 2), SHAPE)
    tb = fm.sample_t(jax.random.fold_in(rng, 3), SHAPE[0])

    def model(x, tt, **kw):
        return jnp.zeros_like(x)

    terms = jax.jit(lambda x, t, n: fm.training_losses(model, x, t, n))(
        x0, tb, noise
    )
    assert terms["loss"].shape == (SHAPE[0],)
    assert np.isfinite(np.asarray(terms["loss"])).all()


@pytest.mark.parametrize("mt", [ModelMeanType.EPSILON])
def test_flow_sampling_rejects_singular_mean_types(mt):
    """EPSILON flow sampling divides by alpha_t=0 on the first drift eval
    (the reference NaNs identically, gaussian_diffusion.py:1205-1228 on its
    linspace(1,0) grid); the sampler must refuse loudly, not return NaN."""
    fm = FlowMatching(model_mean_type=mt, path_type="linear")
    noise = jnp.zeros((2, 4, 4, 1))
    model = lambda x, t: x
    with pytest.raises(ValueError, match="singular"):
        fm.ode_sample(model, noise, num_steps=4, solver="euler")
    with pytest.raises(ValueError, match="singular"):
        fm.sde_sample(model, jax.random.key(0), noise, num_steps=4,
                      solver="euler")


def test_flow_ode_rejects_start_x():
    fm = FlowMatching(model_mean_type=ModelMeanType.START_X,
                      path_type="linear")
    with pytest.raises(ValueError, match="singular"):
        fm.ode_sample(lambda x, t: x, jnp.zeros((2, 4, 4, 1)),
                      num_steps=4, solver="euler")
