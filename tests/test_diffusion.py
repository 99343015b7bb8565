"""Process-level invariants: q_sample inversion, prediction conversions,
exact-model DDIM recovery, training-loss wiring, VLB finiteness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaw_tpu.core import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    get_named_beta_schedule,
    make_schedule,
    respace_schedule,
    space_timesteps,
)

SHAPE = (4, 8, 8, 3)  # NHWC


@pytest.fixture(scope="module")
def sched():
    return make_schedule(get_named_beta_schedule("linear", 100))


@pytest.fixture(scope="module")
def gd(sched):
    return GaussianDiffusion(schedule=sched, rescale_timesteps=False)


def test_q_sample_eps_roundtrip(gd):
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    t = jnp.array([0, 10, 50, 99])
    x_t = gd.q_sample(x0, t, noise)
    x0_hat = gd._predict_xstart_from_eps(x_t, t, noise)
    np.testing.assert_allclose(x0_hat, x0, atol=1e-3)
    eps_hat = gd._predict_eps_from_xstart(x_t, t, x0)
    np.testing.assert_allclose(eps_hat, noise, atol=1e-3)


def test_velocity_xstart_roundtrip(gd):
    """x0 = alpha x_t - sigma v must invert the v-target exactly (fixed
    reference bug at gaussian_diffusion.py:394-399)."""
    rng = jax.random.key(2)
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    t = jnp.array([3, 20, 60, 95])
    x_t = gd.q_sample(x0, t, noise)
    gdv = GaussianDiffusion(
        schedule=gd.schedule, model_mean_type=ModelMeanType.VELOCITY,
        rescale_timesteps=False,
    )
    v = gdv.compute_target(x0, noise, t)
    x0_hat = gdv._predict_xstart_from_v(x_t, t, v)
    np.testing.assert_allclose(x0_hat, x0, atol=1e-3)


def test_q_posterior_mean_at_t1_is_x0_weighted(gd):
    x0 = jnp.ones(SHAPE)
    x_t = jnp.ones(SHAPE) * 2.0
    t = jnp.zeros((4,), jnp.int32)
    mean, var, logvar = gd.q_posterior_mean_variance(x0, x_t, t)
    s = gd.schedule
    expected = s.posterior_mean_coef1[0] * 1.0 + s.posterior_mean_coef2[0] * 2.0
    np.testing.assert_allclose(mean, expected, rtol=1e-5)


def _exact_eps_model(sched, x0):
    """A model that outputs the exact eps implied by (x_t, t, x0)."""
    acp = jnp.asarray(sched.alphas_cumprod, jnp.float32)

    def model(x, t, **kw):
        t = t.astype(jnp.int32)
        a = jnp.sqrt(acp)[t].reshape(-1, 1, 1, 1)
        s = jnp.sqrt(1 - acp)[t].reshape(-1, 1, 1, 1)
        return (x - a * x0) / s

    return model


def test_ddim_exact_model_recovers_x0(sched):
    """With an oracle eps model, deterministic DDIM must land on x0 from any
    noise (sampler trajectory test, SURVEY.md section 4 item (c))."""
    rng = jax.random.key(3)
    x0 = jax.random.normal(rng, SHAPE) * 0.5
    base = make_schedule(get_named_beta_schedule("linear", 1000))
    sub = respace_schedule(base, space_timesteps(1000, "ddim25"))
    gd = GaussianDiffusion(schedule=sub, rescale_timesteps=False)

    # Model receives mapped (original-process) t; map back to alpha_bar.
    acp_base = jnp.asarray(base.alphas_cumprod, jnp.float32)

    def model(x, t, **kw):
        a = jnp.sqrt(acp_base)[t.astype(jnp.int32)].reshape(-1, 1, 1, 1)
        s = jnp.sqrt(1 - acp_base)[t.astype(jnp.int32)].reshape(-1, 1, 1, 1)
        return (x - a * x0) / s

    out = gd.ddim_sample_loop(
        model, jax.random.fold_in(rng, 1), SHAPE, clip_denoised=False
    )
    np.testing.assert_allclose(out, x0, atol=5e-3)


def test_p_sample_loop_shapes_and_finiteness(gd):
    model = _exact_eps_model(gd.schedule, jnp.zeros(SHAPE))
    out = gd.p_sample_loop(model, jax.random.key(4), SHAPE)
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()
    # Oracle model for x0=0 pulls ancestral samples near 0.
    assert np.abs(np.asarray(out)).mean() < 0.5


@pytest.mark.parametrize(
    "mean_type,weight_type",
    [
        (ModelMeanType.EPSILON, "constant"),
        (ModelMeanType.EPSILON, "lambda"),
        (ModelMeanType.EPSILON, "min_snr_5.0"),
        (ModelMeanType.START_X, "snr"),
        (ModelMeanType.VELOCITY, "lambda"),
    ],
)
def test_training_losses_mse(sched, mean_type, weight_type):
    gd = GaussianDiffusion(
        schedule=sched, model_mean_type=mean_type, weight_type=weight_type,
        rescale_timesteps=False,
    )
    rng = jax.random.key(5)
    x0 = jax.random.normal(rng, SHAPE)
    t = gd.sample_t(jax.random.fold_in(rng, 1), SHAPE[0])
    noise = jax.random.normal(jax.random.fold_in(rng, 2), SHAPE)

    def model(x, tt, **kw):
        return jnp.zeros_like(x)

    terms = jax.jit(
        lambda x, t, n: gd.training_losses(model, x, t, n)
    )(x0, t, noise)
    assert terms["loss"].shape == (SHAPE[0],)
    assert np.isfinite(np.asarray(terms["loss"])).all()
    # weight * mean((target-0)^2) == loss
    target = gd.compute_target(x0, noise, t)
    raw = np.asarray(jnp.mean(target ** 2, axis=(1, 2, 3)))
    assert np.isfinite(raw).all()


def test_training_losses_learned_range_vb(sched):
    gd = GaussianDiffusion(
        schedule=sched, model_var_type=ModelVarType.LEARNED_RANGE,
        loss_type=LossType.RESCALED_MSE, rescale_timesteps=False,
    )
    rng = jax.random.key(6)
    x0 = jnp.clip(jax.random.normal(rng, SHAPE), -1, 1)
    t = gd.sample_t(jax.random.fold_in(rng, 1), SHAPE[0])
    noise = jax.random.normal(jax.random.fold_in(rng, 2), SHAPE)

    def model(x, tt, **kw):
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=-1)

    terms = gd.training_losses(model, x0, t, noise)
    assert "vb" in terms
    assert np.isfinite(np.asarray(terms["vb"])).all()
    np.testing.assert_allclose(
        terms["loss"], terms["mse"] + terms["vb"], rtol=1e-5
    )


def test_training_losses_kl(sched):
    gd = GaussianDiffusion(
        schedule=sched, loss_type=LossType.KL,
        model_var_type=ModelVarType.LEARNED_RANGE, rescale_timesteps=False,
    )
    rng = jax.random.key(7)
    x0 = jnp.clip(jax.random.normal(rng, SHAPE), -1, 1)
    t = gd.sample_t(jax.random.fold_in(rng, 1), SHAPE[0])
    noise = jax.random.normal(jax.random.fold_in(rng, 2), SHAPE)

    def model(x, tt, **kw):
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=-1)

    terms = gd.training_losses(model, x0, t, noise)
    assert np.isfinite(np.asarray(terms["loss"])).all()


def test_align_loss_wiring(sched):
    gd = GaussianDiffusion(
        schedule=sched, learn_align=True, gamma=0.5, align_type="cosine",
        rescale_timesteps=False,
    )
    rng = jax.random.key(8)
    x0 = jax.random.normal(rng, SHAPE)
    t = gd.sample_t(jax.random.fold_in(rng, 1), SHAPE[0])
    noise = jax.random.normal(jax.random.fold_in(rng, 2), SHAPE)
    feats = jax.random.normal(jax.random.fold_in(rng, 3), (SHAPE[0], 16, 32))

    def model(x, tt, **kw):
        zs = jnp.ones((x.shape[0], 16, 32))
        return jnp.zeros_like(x), zs

    terms = gd.training_losses(model, x0, t, noise, features=feats)
    assert "align" in terms
    np.testing.assert_allclose(
        terms["loss"], terms["mse"] + 0.5 * terms["align"], rtol=1e-5
    )


def test_bpd_loop_runs(sched):
    small = make_schedule(get_named_beta_schedule("cosine", 10))
    gd = GaussianDiffusion(schedule=small, rescale_timesteps=False)
    x0 = jnp.clip(jax.random.normal(jax.random.key(9), (2, 4, 4, 3)), -1, 1)
    model = _exact_eps_model(small, x0)
    out = gd.calc_bpd_loop(model, jax.random.key(10), x0)
    assert out["vb"].shape == (2, 10)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    # Oracle model's eps-MSE is ~0.
    assert np.asarray(out["mse"]).max() < 1e-5


def test_timestep_rescaling():
    base = make_schedule(get_named_beta_schedule("linear", 1000))
    sub = respace_schedule(base, space_timesteps(1000, "ddim18"))
    gd = GaussianDiffusion(schedule=sub, rescale_timesteps=True)
    seen = {}

    def model(x, t, **kw):
        seen["t"] = t
        return jnp.zeros_like(x)

    x = jnp.zeros((2, 4, 4, 3))
    gd.p_mean_variance(model, x, jnp.array([0, 17]))
    t_seen = np.asarray(seen["t"])
    # Mapped to original indices then scaled by 1000/1000.
    assert t_seen[0] == pytest.approx(sub.timestep_map[0])
    assert t_seen[1] == pytest.approx(sub.timestep_map[17])
