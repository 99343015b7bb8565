"""EDM sampler tests: ladder geometry, preconditioning coefficients,
oracle-denoiser trajectory recovery, CFG identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaw_tpu.core.schedules import edm_sigma_ladder
from vaw_tpu.samplers.edm import (
    ablation_sampler,
    build_edm_plan,
    round_sigma_index,
)
from vaw_tpu.samplers.guidance import IntervalCFG, cfg_scale_for_time

SHAPE = (2, 8, 8, 3)
M = 1000


def test_edm_plan_sigma_ladder_geometry():
    """edm discretization + linear schedule + no scaling: t_steps are the
    rho-spaced sigmas rounded to the ladder; with S_churn=0 the churn is a
    no-op (reference: tools/cfg_edm.py:141-157, 188-193)."""
    plan = build_edm_plan(num_steps=18, noise_schedule="linear",
                          pred_type="EPSILON")
    u = edm_sigma_ladder("linear", M=M)
    sigma_min, sigma_max = max(0.002, u[M - 1]), min(80, u[0])
    idx = np.arange(18)
    rho = 7
    sig = (sigma_max ** (1 / rho) + idx / 17 *
           (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    rounded = u[round_sigma_index(u, sig)]
    # t == sigma for the linear schedule; first-step x scale is sigma_max-ish.
    assert plan.x0_scale == pytest.approx(rounded[0])
    np.testing.assert_allclose(plan.ratio, 1.0)  # no churn
    np.testing.assert_allclose(plan.noise_scale, 0.0)
    # h spacing: t_next - t_cur over the rounded ladder (+ final 0).
    t_all = np.concatenate([rounded, [0.0]])
    np.testing.assert_allclose(plan.h, np.diff(t_all), rtol=1e-10)
    # d coefficients: sigma'=1, s=1 -> d_a = 1/sigma, d_b = 1/sigma.
    np.testing.assert_allclose(plan.d_a_hat, 1 / rounded, rtol=1e-10)
    np.testing.assert_allclose(plan.d_b_hat, 1 / rounded, rtol=1e-10)
    # c_noise is the reversed ladder index (reference: cfg_edm.py:56).
    expect_cnoise = M - 1 - round_sigma_index(u, rounded)
    np.testing.assert_allclose(plan.c_noise_hat, expect_cnoise)


@pytest.mark.parametrize("pred_type,solver", [
    ("EPSILON", "heun"), ("EPSILON", "euler"),
    ("START_X", "heun"), ("VELOCITY", "heun"),
])
def test_edm_oracle_recovers_x0(pred_type, solver):
    """An oracle denoiser (denoised == x0 for all sigma) makes the EDM ODE
    trajectory linear in sigma, so any solver must land exactly on x0
    (trajectory test, SURVEY.md section 4 item (c))."""
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, SHAPE) * 0.4
    u = jnp.asarray(edm_sigma_ladder("linear", M=M), jnp.float32)
    plan = build_edm_plan(num_steps=12, solver=solver,
                          noise_schedule="linear", pred_type=pred_type)

    def model_fn(x_in, t, y=None, g=None):
        # x_in = c_in * x; recover sigma from c_noise index t.
        sigma = u[M - 1 - t[0].astype(jnp.int32)]
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1)
        x = x_in / c_in
        if pred_type == "EPSILON":
            return (x - x0) / sigma  # denoised = x - sigma*eps = x0
        if pred_type == "START_X":
            return x0
        # VELOCITY: denoised = c_skip*x + c_out*v with c_skip=c_in^2,
        # c_out=-sigma*c_in -> v = (c_in^2 x - x0)/(sigma c_in)
        return (c_in ** 2 * x - x0) / (sigma * c_in)

    latents = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    out = ablation_sampler(model_fn, jax.random.fold_in(rng, 2), latents, plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-3)


@pytest.mark.parametrize("disc,sched,scal", [
    ("vp", "vp", "vp"), ("ve", "ve", "none"), ("iddpm", "linear", "none"),
    ("edm", "linear", "none"),
])
def test_edm_all_discretizations_finite(disc, sched, scal):
    plan = build_edm_plan(num_steps=6, discretization=disc, schedule=sched,
                          scaling=scal, noise_schedule="cosine",
                          pred_type="EPSILON")
    for field in ("ratio", "h", "c_in_hat", "d_a_hat", "d_b_hat"):
        assert np.isfinite(getattr(plan, field)).all(), (disc, field)

    def model_fn(x, t, y=None, g=None):
        return jnp.zeros_like(x)

    rng = jax.random.key(3)
    out = ablation_sampler(
        model_fn, rng, jax.random.normal(rng, SHAPE), plan
    )
    assert np.isfinite(np.asarray(out)).all()


def test_edm_churn_injects_noise():
    plan = build_edm_plan(num_steps=8, S_churn=10, noise_schedule="linear",
                          pred_type="EPSILON")
    assert (np.asarray(plan.noise_scale) > 0).any()
    assert (np.asarray(plan.ratio) == 1.0).all()  # scaling none: s==1


def test_interval_cfg_identity_at_scale_one():
    """g=1 must equal the conditional output exactly."""

    def model_fn(x, t, y=None):
        return x * (1.0 + y[:, None, None, None].astype(jnp.float32))

    cfg1 = IntervalCFG(model_fn, num_classes=10, guidance_scale=1.0)
    x = jax.random.normal(jax.random.key(0), SHAPE)
    t = jnp.zeros((SHAPE[0],))
    y = jnp.array([2, 3])
    np.testing.assert_allclose(
        np.asarray(cfg1(x, t, y)), np.asarray(model_fn(x, t, y)), rtol=1e-6
    )


def test_interval_cfg_guides():
    """g=2 must extrapolate: uncond + 2(cond - uncond)."""

    def model_fn(x, t, y=None):
        is_null = (y == 10).astype(jnp.float32)[:, None, None, None]
        return jnp.where(is_null > 0, jnp.zeros_like(x), jnp.ones_like(x))

    cfg = IntervalCFG(model_fn, num_classes=10, guidance_scale=2.0)
    x = jnp.zeros(SHAPE)
    t = jnp.zeros((SHAPE[0],))
    y = jnp.array([1, 2])
    out = cfg(x, t, y)
    np.testing.assert_allclose(np.asarray(out), 2.0)  # 0 + 2*(1-0)


def test_cfg_scale_for_time_interval():
    assert cfg_scale_for_time(5.0, 3.0, (-1.0, -1.0)) == 3.0
    assert cfg_scale_for_time(5.0, 3.0, (0.0, 10.0)) == 3.0
    assert cfg_scale_for_time(15.0, 3.0, (0.0, 10.0)) == 1.0
    assert cfg_scale_for_time(15.0, 1.0, (0.0, 10.0)) == 1.0
