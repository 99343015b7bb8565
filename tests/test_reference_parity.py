"""Differential parity tests against the reference implementation itself.

Imports /root/reference on CPU torch (via tests/_reference.py stubs) and
asserts the TPU framework reproduces its numerics: beta schedules and
coefficient tables bit-match, every variance-aware weight cell bit-matches
(tools/gaussian_diffusion.py:1092-1148), the EDM ablation-sampler
trajectories match for all discretization/schedule/scaling/pred-type
configs (tools/cfg_edm.py:109-208), DDIM respacing matches
(tools/respace.py:9-130), and p_mean_variance / DDIM steps /
training_losses match on a shared toy network
(tools/gaussian_diffusion.py:278-930).

Known reference bugs intentionally NOT reproduced (documented divergences):
- _predict_xstart_from_v broadcasts with t.shape (gaussian_diffusion.py:394-399)
  -> VELOCITY is excluded from the p_mean_variance grid (it crashes upstream
  unless W == B); the VELOCITY training target itself is compared.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from _reference import load_reference

from vaw_tpu.core.diffusion import GaussianDiffusion
from vaw_tpu.core.schedules import (
    get_named_beta_schedule,
    make_schedule,
    respace_schedule,
    space_timesteps,
)
from vaw_tpu.core.types import LossType, ModelMeanType, ModelVarType
from vaw_tpu.core.weighting import compute_mse_loss_weight

ref_gd = load_reference("tools.gaussian_diffusion")
ref_respace = load_reference("tools.respace")
ref_edm = load_reference("tools.cfg_edm")

SCHEDULES = ["linear", "cosine", "linear_logsnr"]


def _ref_args(**over):
    base = dict(weight_type="constant", gamma=0.0, learn_sigma=False,
                learn_align=False, p2_gamma=1.0, p2_k=1.0, amp=False)
    base.update(over)
    return SimpleNamespace(**base)


def _ref_diffusion(betas, mean_type="EPSILON", var_type="FIXED_LARGE",
                   loss_type="MSE", **args_over):
    return ref_gd.GaussianDiffusion(
        args=_ref_args(**args_over),
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType[mean_type],
        model_var_type=ref_gd.ModelVarType[var_type],
        loss_type=ref_gd.LossType[loss_type],
        device="cpu",
    )


def _my_diffusion(schedule, mean_type="EPSILON", var_type="FIXED_LARGE",
                  loss_type="MSE", **kw):
    return GaussianDiffusion(
        schedule=schedule,
        model_mean_type=ModelMeanType[mean_type],
        model_var_type=ModelVarType[var_type],
        loss_type=LossType[loss_type],
        rescale_timesteps=False,
        **kw,
    )


# --------------------------------------------------------------------------
# (a) schedules + coefficient tables
# --------------------------------------------------------------------------

@pytest.mark.parametrize("name", SCHEDULES)
@pytest.mark.parametrize("T", [50, 1000])
def test_beta_schedule_bitmatch(name, T):
    ref = np.asarray(ref_gd.get_named_beta_schedule(name, T), np.float64)
    mine = np.asarray(get_named_beta_schedule(name, T), np.float64)
    np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=0)


@pytest.mark.parametrize("name", SCHEDULES)
def test_coefficient_tables_bitmatch(name):
    T = 100
    betas = ref_gd.get_named_beta_schedule(name, T)
    ref = _ref_diffusion(betas)
    mine = make_schedule(np.asarray(betas))
    for field in (
        "alphas_cumprod", "alphas_cumprod_prev", "alphas_cumprod_next",
        "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
        "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2",
    ):
        np.testing.assert_allclose(
            getattr(mine, field), getattr(ref, field),
            rtol=1e-12, atol=0, err_msg=field,
        )


def test_respacing_bitmatch():
    T = 1000
    for spec in ["ddim25", "ddim50", "100", "25,25,25"]:
        ref_set = ref_respace.space_timesteps(T, spec)
        my_set = space_timesteps(T, spec)
        assert set(my_set) == set(ref_set), spec

        betas = ref_gd.get_named_beta_schedule("linear", T)
        spaced = ref_respace.SpacedDiffusion(
            use_timesteps=ref_set,
            args=_ref_args(),
            betas=betas,
            model_mean_type=ref_gd.ModelMeanType.EPSILON,
            model_var_type=ref_gd.ModelVarType.FIXED_LARGE,
            loss_type=ref_gd.LossType.MSE,
            device="cpu",
        )
        mine = respace_schedule(make_schedule(np.asarray(betas)), my_set)
        np.testing.assert_allclose(mine.betas, spaced.betas, rtol=1e-12,
                                   atol=0, err_msg=spec)
        np.testing.assert_array_equal(
            mine.timestep_map, np.asarray(spaced.timestep_map), err_msg=spec)


# --------------------------------------------------------------------------
# (a') every variance-aware weight cell (the research contribution)
# --------------------------------------------------------------------------

WEIGHT_CELLS = (
    [("EPSILON", w) for w in
     ["constant", "min_snr_5", "max_snr_5", "lambda", "debias", "p2",
      "min_debias", "max_debias"]]
    + [("START_X", w) for w in
       ["constant", "trunc_snr", "snr", "inv_snr", "min_snr_5", "max_snr_5",
        "lambda"]]
    + [("VECTOR", "lambda"), ("VECTOR", "constant")]
    + [("VELOCITY", "min_snr_5"), ("VELOCITY", "lambda"),
       ("VELOCITY", "constant")]
)


@pytest.mark.parametrize("mean_type,weight_type", WEIGHT_CELLS)
def test_weight_cell_bitmatch(mean_type, weight_type):
    T = 1000
    betas = get_named_beta_schedule("linear", T)
    sched = make_schedule(betas)
    t = np.array([0, 1, 17, 250, 500, 998, 999])
    alpha = sched.sqrt_alphas_cumprod[t].astype(np.float32)
    sigma = sched.sqrt_one_minus_alphas_cumprod[t].astype(np.float32)
    # include the snr == 0 guard cell (alpha -> 0)
    alpha = np.concatenate([alpha, [0.0]]).astype(np.float32)
    sigma = np.concatenate([sigma, [1.0]]).astype(np.float32)
    t = np.concatenate([t, [999]])

    ref = ref_gd.compute_mse_loss_weight(
        ref_gd.ModelMeanType[mean_type], weight_type,
        torch.as_tensor(t), torch.as_tensor(alpha), torch.as_tensor(sigma),
        p2_k=1.0, p2_gamma=1.0,
    ).numpy().astype(np.float32)
    mine = np.asarray(compute_mse_loss_weight(
        ModelMeanType[mean_type], weight_type,
        jnp.asarray(t), jnp.asarray(alpha), jnp.asarray(sigma),
        p2_k=1.0, p2_gamma=1.0,
    ))
    np.testing.assert_allclose(mine, ref, rtol=1e-6, atol=0)


# --------------------------------------------------------------------------
# shared toy networks (identical math, torch NCHW / jax NHWC)
# --------------------------------------------------------------------------

class _TorchToyNet(torch.nn.Module):
    """Elementwise net: layout-independent, t-dependent, channel-doubling
    optional (for LEARNED_RANGE)."""

    def __init__(self, double_out=False):
        super().__init__()
        self.double_out = double_out

    def forward(self, x, t, y=None, **kw):
        tt = (t.float() / 1000.0).reshape(-1, 1, 1, 1)
        out = 0.3 * torch.sin(x) + 0.2 * x * torch.cos(3.0 * tt)
        if self.double_out:
            out = torch.cat([out, 0.1 * torch.tanh(x) - 0.2 * tt * torch.ones_like(x)], dim=1)
        return out.float()


def _jax_toy_net(double_out=False):
    def fn(x, t, y=None, **kw):
        tt = (t.astype(jnp.float32) / 1000.0).reshape(-1, 1, 1, 1)
        out = 0.3 * jnp.sin(x) + 0.2 * x * jnp.cos(3.0 * tt)
        if double_out:
            out = jnp.concatenate(
                [out, 0.1 * jnp.tanh(x) - 0.2 * tt * jnp.ones_like(x)], axis=-1)
        return out.astype(jnp.float32)

    return fn


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def _nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return x_nchw.detach().numpy().transpose(0, 2, 3, 1)


# --------------------------------------------------------------------------
# (c) p_mean_variance + DDIM + ancestral machinery
# --------------------------------------------------------------------------

P_MEAN_VAR_GRID = [
    ("EPSILON", "FIXED_LARGE", False),
    ("EPSILON", "FIXED_SMALL", False),
    ("EPSILON", "LEARNED_RANGE", True),
    ("EPSILON", "LEARNED", True),
    ("START_X", "FIXED_LARGE", False),
    ("PREVIOUS_X", "FIXED_SMALL", False),
]


@pytest.mark.parametrize("mean_type,var_type,double", P_MEAN_VAR_GRID)
def test_p_mean_variance_parity(mean_type, var_type, double):
    T = 100
    betas = get_named_beta_schedule("cosine", T)
    rs = np.random.RandomState(0)
    x = rs.randn(4, 5, 6, 3).astype(np.float32)  # W != B on purpose
    t = np.array([0, 13, 50, 99])

    ref = _ref_diffusion(betas, mean_type, var_type)
    ref_out = ref.p_mean_variance(
        _TorchToyNet(double), _nchw(x), torch.as_tensor(t),
        clip_denoised=True)

    mine = _my_diffusion(make_schedule(betas), mean_type, var_type)
    my_out = mine.p_mean_variance(
        _jax_toy_net(double), jnp.asarray(x), jnp.asarray(t),
        clip_denoised=True)

    for key in ("mean", "variance", "log_variance", "pred_xstart"):
        ref_val = _nhwc(ref_out[key])
        # mine keeps FIXED_* variance in broadcastable [N,1,1,1] form
        my_val = np.broadcast_to(np.asarray(my_out[key]), ref_val.shape)
        np.testing.assert_allclose(
            my_val, ref_val,
            rtol=1e-5, atol=1e-6, err_msg=f"{mean_type}/{var_type}/{key}",
        )


def test_ddim_step_parity():
    """One deterministic DDIM step (eta=0) and one DDIM-reverse step match
    the reference (gaussian_diffusion.py:603-690)."""
    T = 100
    betas = get_named_beta_schedule("linear", T)
    rs = np.random.RandomState(1)
    x = rs.randn(4, 5, 6, 3).astype(np.float32)
    t = np.array([3, 20, 60, 99])

    ref = _ref_diffusion(betas)
    mine = _my_diffusion(make_schedule(betas))

    ref_step = ref.ddim_sample(
        _TorchToyNet(), _nchw(x), torch.as_tensor(t), eta=0.0)
    my_step = mine.ddim_sample(
        _jax_toy_net(), jax.random.key(0), jnp.asarray(x), jnp.asarray(t),
        eta=0.0)
    np.testing.assert_allclose(
        np.asarray(my_step["sample"]), _nhwc(ref_step["sample"]),
        rtol=1e-5, atol=1e-6)

    ref_rev = ref.ddim_reverse_sample(
        _TorchToyNet(), _nchw(x), torch.as_tensor(t))
    my_rev = mine.ddim_reverse_sample(
        _jax_toy_net(), jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(my_rev["sample"]), _nhwc(ref_rev["sample"]),
        rtol=1e-5, atol=1e-6)


def test_ancestral_mean_parity():
    """p_sample randomness differs by RNG; its deterministic core
    (posterior mean/log-variance at nonzero t) is p_mean_variance, already
    covered. Here: q_sample and q_posterior match exactly."""
    T = 50
    betas = get_named_beta_schedule("cosine", T)
    rs = np.random.RandomState(2)
    x0 = rs.randn(3, 4, 4, 2).astype(np.float32)
    xt = rs.randn(3, 4, 4, 2).astype(np.float32)
    noise = rs.randn(3, 4, 4, 2).astype(np.float32)
    t = np.array([0, 7, 49])

    ref = _ref_diffusion(betas)
    mine = _my_diffusion(make_schedule(betas))

    ref_q = ref.q_sample(_nchw(x0), torch.as_tensor(t), noise=_nchw(noise))
    my_q = mine.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(my_q), _nhwc(ref_q),
                               rtol=1e-6, atol=1e-7)

    ref_mean, ref_var, ref_logvar = ref.q_posterior_mean_variance(
        _nchw(x0), _nchw(xt), torch.as_tensor(t))
    my_mean, my_var, my_logvar = mine.q_posterior_mean_variance(
        jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(my_mean), _nhwc(ref_mean),
                               rtol=1e-6, atol=1e-7)
    # mine keeps the posterior variance in broadcastable [N,1,1,1] form
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(my_var), _nhwc(ref_var).shape),
        _nhwc(ref_var), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(my_logvar), _nhwc(ref_logvar).shape),
        _nhwc(ref_logvar), rtol=1e-6, atol=1e-7)


TRAIN_LOSS_GRID = [
    ("EPSILON", "FIXED_LARGE", "MSE", "lambda", False),
    ("EPSILON", "FIXED_LARGE", "MSE", "min_snr_5", False),
    ("EPSILON", "LEARNED_RANGE", "RESCALED_MSE", "constant", True),
    ("START_X", "FIXED_LARGE", "MSE", "snr", False),
    ("VELOCITY", "FIXED_LARGE", "MSE", "lambda", False),
]


@pytest.mark.parametrize("mean_type,var_type,loss_type,weight,double",
                         TRAIN_LOSS_GRID)
def test_training_losses_parity(mean_type, var_type, loss_type, weight,
                                double):
    T = 100
    betas = get_named_beta_schedule("linear", T)
    rs = np.random.RandomState(3)
    x0 = rs.randn(4, 6, 6, 3).astype(np.float32)
    noise = rs.randn(4, 6, 6, 3).astype(np.float32)
    t = np.array([0, 11, 60, 99])

    ref = _ref_diffusion(betas, mean_type, var_type, loss_type,
                         weight_type=weight,
                         learn_sigma=double)
    ref_terms = ref.training_losses(
        _TorchToyNet(double), _nchw(x0), t=torch.as_tensor(t),
        noise=_nchw(noise))

    mine = _my_diffusion(make_schedule(betas), mean_type, var_type,
                         loss_type, weight_type=weight)
    my_terms = mine.training_losses(
        _jax_toy_net(double), jnp.asarray(x0), jnp.asarray(t),
        jnp.asarray(noise))

    np.testing.assert_allclose(
        np.asarray(my_terms["loss"]),
        ref_terms["loss"].detach().numpy(),
        rtol=1e-5, atol=1e-6,
        err_msg=f"{mean_type}/{var_type}/{loss_type}/{weight}",
    )


# --------------------------------------------------------------------------
# (b) EDM ablation sampler: full trajectory parity
# --------------------------------------------------------------------------

def _edm_case(num_steps, discretization, schedule, scaling, solver,
              pred_type, noise_schedule="linear"):
    torch.manual_seed(0)
    rs = np.random.RandomState(4)
    latents = rs.randn(2, 3, 8, 8).astype(np.float32)

    net = ref_edm.Net(
        _TorchToyNet(), img_resolution=8, img_channels=3,
        pred_type=pred_type, noise_schedule=noise_schedule)
    with torch.no_grad():
        ref_out = ref_edm.ablation_sampler(
            net, torch.from_numpy(latents), num_steps=num_steps,
            solver=solver, discretization=discretization, schedule=schedule,
            scaling=scaling,
        ).numpy()

    from vaw_tpu.samplers.edm import ablation_sampler, build_edm_plan

    plan = build_edm_plan(
        num_steps=num_steps, solver=solver, discretization=discretization,
        schedule=schedule, scaling=scaling, noise_schedule=noise_schedule,
        pred_type=pred_type,
    )
    my_out = ablation_sampler(
        lambda x, t, y=None, g=None: _jax_toy_net()(x, t),
        jax.random.key(0),
        jnp.asarray(latents.transpose(0, 2, 3, 1)),
        plan,
    )
    ref_nhwc = ref_out.transpose(0, 2, 3, 1)
    # The device loop runs f32 (TPU design) vs the reference's f64 host loop;
    # error is relative to the trajectory's overall scale (the ve schedule
    # spans t up to ~2e4), so scale atol by max|ref|.
    atol = 3e-4 * max(np.abs(ref_nhwc).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(my_out), ref_nhwc, rtol=3e-4, atol=atol,
        err_msg=f"{discretization}/{schedule}/{scaling}/{solver}/{pred_type}",
    )


@pytest.mark.parametrize("discretization", ["vp", "ve", "iddpm", "edm"])
@pytest.mark.parametrize("schedule", ["vp", "ve", "linear"])
@pytest.mark.parametrize("scaling", ["vp", "none"])
def test_edm_trajectory_parity_grid(discretization, schedule, scaling):
    """All 4 x 3 x 2 ablation-sampler configs, Heun, EPSILON pred."""
    _edm_case(6, discretization, schedule, scaling, "heun", "EPSILON")


@pytest.mark.parametrize("pred_type", ["EPSILON", "START_X", "VELOCITY"])
@pytest.mark.parametrize("noise_schedule", SCHEDULES)
def test_edm_pred_types_and_ladders(pred_type, noise_schedule):
    """Default edm/linear/none config across pred types and the u-ladder's
    three noise schedules (cfg_edm.py:43-48, 85-100)."""
    _edm_case(8, "edm", "linear", "none", "heun", pred_type,
              noise_schedule=noise_schedule)


def test_edm_euler_and_default_18_steps():
    _edm_case(18, "edm", "linear", "none", "heun", "EPSILON")
    _edm_case(18, "edm", "linear", "none", "euler", "EPSILON")


def test_ddim_full_loop_respaced_parity():
    """FULL deterministic DDIM trajectory (eta=0, shared init noise)
    through the respaced ddim25-of-100 schedule: exercises the timestep
    remap (reference SpacedDiffusion._wrap_model, respace.py:90-130 vs our
    timestep_map gather), the scan loop, and the final clamp end-to-end on
    the shared toy net."""
    T, SECT = 100, "ddim25"
    betas = get_named_beta_schedule("linear", T)
    use = ref_respace.space_timesteps(T, SECT)

    ref = ref_respace.SpacedDiffusion(
        use_timesteps=use,
        args=_ref_args(),
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType.EPSILON,
        model_var_type=ref_gd.ModelVarType.FIXED_LARGE,
        loss_type=ref_gd.LossType.MSE,
        device="cpu",
    )
    sched = respace_schedule(make_schedule(betas), space_timesteps(T, SECT))
    mine = _my_diffusion(sched)

    rs = np.random.RandomState(3)
    noise = rs.randn(4, 8, 8, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.ddim_sample_loop(
            _TorchToyNet(), (4, 3, 8, 8), noise=_nchw(noise),
            clip_denoised=True, eta=0.0, progress=False, device="cpu",
        )
    my_out = mine.ddim_sample_loop(
        _jax_toy_net(), jax.random.key(0), (4, 8, 8, 3),
        noise=jnp.asarray(noise), clip_denoised=True, eta=0.0,
    )
    np.testing.assert_allclose(np.asarray(my_out), _nhwc(ref_out),
                               rtol=1e-4, atol=1e-5)
