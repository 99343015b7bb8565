"""Discrete-time Gaussian diffusion as pure, jittable functions.

Re-design of the reference's GaussianDiffusion / SpacedDiffusion
(reference: tools/gaussian_diffusion.py:126-1005, tools/respace.py:65-130)
for TPU:

* coefficient tables are host-side f64 numpy (`Schedule`), gathered as f32
  constants inside jit — no device-side f64;
* arrays are NHWC (channels-last), the layout XLA:TPU prefers for convs; the
  learned-variance split therefore happens on the last axis (the reference
  splits dim=1 in NCHW, tools/gaussian_diffusion.py:314);
* sampling loops are `lax.scan` bodies so an entire 1000-step ancestral or
  respaced DDIM chain compiles to one XLA program;
* randomness is explicit `jax.random` key threading (deterministic by
  construction, replacing rank-offset seeds, reference tools/utils.py:62-69);
* the respaced (DDIM-strided) process is the same class with a respaced
  `Schedule` — the t-remap that the reference implements with a model wrapper
  (tools/respace.py:118-130) is a precomputed gather over
  `schedule.timestep_map`.

Known reference bugs fixed rather than replicated (SURVEY.md section 7):
`_predict_xstart_from_v` broadcast over t.shape (gaussian_diffusion.py:394-399)
is computed with x_t-shaped coefficients here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .losses import (
    compute_align_loss,
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
)
from .schedules import Schedule
from .types import LossType, ModelMeanType, ModelVarType
from .weighting import compute_mse_loss_weight

ModelFn = Callable[..., Any]

__all__ = ["GaussianDiffusion", "unpack_model_output"]


def unpack_model_output(raw_output):
    """Models may return (pred, aux_features) — DiT's REPA tap
    (reference: tools/gaussian_diffusion.py:208-215). Returns (pred, aux)."""
    if isinstance(raw_output, tuple):
        return raw_output[0], (raw_output[1] if len(raw_output) > 1 else None)
    return raw_output, None


def _extract(arr: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather f64 table values at timesteps t as f32, shaped [N, 1, ...] for
    broadcasting (reference: tools/gaussian_diffusion.py:1059-1072)."""
    out = jnp.asarray(arr, jnp.float32)[t]
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Training and sampling utilities for DDPM-family models.

    All methods are pure; `model_fn` is a closure over parameters (typically
    `lambda x, t, **kw: model.apply(params, x, t, **kw)`).
    """

    schedule: Schedule
    model_mean_type: ModelMeanType = ModelMeanType.EPSILON
    model_var_type: ModelVarType = ModelVarType.FIXED_LARGE
    loss_type: LossType = LossType.MSE
    rescale_timesteps: bool = True
    weight_type: str = "constant"
    p2_k: float = 1.0
    p2_gamma: float = 1.0
    gamma: float = 0.0
    learn_align: bool = False
    align_type: str = "mse"

    # ------------------------------------------------------------------ #
    # basics
    # ------------------------------------------------------------------ #

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    def _model_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """Timestep as seen by the model: remap respaced indices to original
        ones, then optionally rescale to the 0..1000 range
        (reference: tools/respace.py:125-130, gaussian_diffusion.py:417-420).
        """
        mapped = jnp.asarray(self.schedule.timestep_map)[t]
        if self.rescale_timesteps:
            return mapped.astype(jnp.float32) * (
                1000.0 / self.schedule.original_num_steps
            )
        return mapped

    def q_mean_variance(self, x_start, t):
        """q(x_t | x_0) (reference: tools/gaussian_diffusion.py:217-232)."""
        s = self.schedule
        mean = _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        variance = _extract(1.0 - s.alphas_cumprod, t, x_start.ndim)
        log_variance = _extract(s.log_one_minus_alphas_cumprod, t, x_start.ndim)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Sample from q(x_t | x_0)
        (reference: tools/gaussian_diffusion.py:234-252)."""
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        """q(x_{t-1} | x_t, x_0)
        (reference: tools/gaussian_diffusion.py:254-276)."""
        s = self.schedule
        posterior_mean = (
            _extract(s.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _extract(s.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        posterior_variance = _extract(s.posterior_variance, t, x_t.ndim)
        posterior_log_variance = _extract(
            s.posterior_log_variance_clipped, t, x_t.ndim
        )
        return posterior_mean, posterior_variance, posterior_log_variance

    # ------------------------------------------------------------------ #
    # prediction conversions
    # ------------------------------------------------------------------ #

    def _predict_xstart_from_eps(self, x_t, t, eps):
        s = self.schedule
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
        )

    def _predict_xstart_from_v(self, x_t, t, v):
        # x0 = alpha * x_t - sigma * v (correct broadcast; the reference's
        # t.shape broadcast at gaussian_diffusion.py:394-399 is a latent bug).
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(s.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
        )

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        s = self.schedule
        return (
            _extract(1.0 / s.posterior_mean_coef1, t, x_t.ndim) * xprev
            - _extract(
                s.posterior_mean_coef2 / s.posterior_mean_coef1, t, x_t.ndim
            )
            * x_t
        )

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        s = self.schedule
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_xstart
        ) / _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    # ------------------------------------------------------------------ #
    # p(x_{t-1} | x_t)
    # ------------------------------------------------------------------ #

    def p_mean_variance(
        self,
        model_fn: ModelFn,
        x,
        t,
        clip_denoised: bool = True,
        denoised_fn=None,
        model_kwargs: Optional[Dict] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Model mean/variance + x0 prediction
        (reference: tools/gaussian_diffusion.py:278-384). Channel split for
        learned variances is on the last (channel) axis — NHWC."""
        model_kwargs = model_kwargs or {}
        s = self.schedule
        c = x.shape[-1]

        raw = model_fn(x, self._model_t(t), **model_kwargs)
        model_output, _ = unpack_model_output(raw)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            assert model_output.shape == (*x.shape[:-1], 2 * c)
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(s.posterior_log_variance_clipped, t, x.ndim)
                max_log = _extract(np.log(s.betas), t, x.ndim)
                # model_var_values in [-1, 1] interpolates [min_var, max_var].
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        else:
            variance_table, log_variance_table = {
                ModelVarType.FIXED_LARGE: (
                    s.fixed_large_variance,
                    np.log(s.fixed_large_variance),
                ),
                ModelVarType.FIXED_SMALL: (
                    s.posterior_variance,
                    s.posterior_log_variance_clipped,
                ),
            }[self.model_var_type]
            model_variance = _extract(variance_table, t, x.ndim)
            model_log_variance = _extract(log_variance_table, t, x.ndim)

        def process_xstart(x0):
            if denoised_fn is not None:
                x0 = denoised_fn(x0)
            if clip_denoised:
                return jnp.clip(x0, -1.0, 1.0)
            return x0

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x, t, model_output)
            )
            model_mean = model_output
        elif self.model_mean_type in (
            ModelMeanType.START_X,
            ModelMeanType.EPSILON,
            ModelMeanType.VELOCITY,
        ):
            if self.model_mean_type == ModelMeanType.START_X:
                pred_xstart = process_xstart(model_output)
            elif self.model_mean_type == ModelMeanType.EPSILON:
                pred_xstart = process_xstart(
                    self._predict_xstart_from_eps(x, t, model_output)
                )
            else:
                pred_xstart = process_xstart(
                    self._predict_xstart_from_v(x, t, model_output)
                )
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        else:
            raise NotImplementedError(self.model_mean_type)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # ------------------------------------------------------------------ #
    # classifier guidance
    # ------------------------------------------------------------------ #

    def condition_mean(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        """Sohl-Dickstein-style mean shift
        (reference: tools/gaussian_diffusion.py:422-435)."""
        gradient = cond_fn(x, self._model_t(t), **(model_kwargs or {}))
        return p_mean_var["mean"] + p_mean_var["variance"] * gradient

    def condition_score(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        """Song et al. score conditioning
        (reference: tools/gaussian_diffusion.py:437-459)."""
        s = self.schedule
        alpha_bar = _extract(s.alphas_cumprod, t, x.ndim)
        eps = self._predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(
            x, self._model_t(t), **(model_kwargs or {})
        )
        out = dict(p_mean_var)
        out["pred_xstart"] = self._predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(
            out["pred_xstart"], x, t
        )
        return out

    # ------------------------------------------------------------------ #
    # single sampling steps
    # ------------------------------------------------------------------ #

    def p_sample(self, model_fn, rng, x, t, clip_denoised=True, denoised_fn=None,
                 cond_fn=None, model_kwargs=None):
        """One ancestral step (reference: tools/gaussian_diffusion.py:461-505)."""
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised, denoised_fn, model_kwargs
        )
        if cond_fn is not None:
            out["mean"] = self.condition_mean(cond_fn, out, x, t, model_kwargs)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        nonzero_mask = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        sample = out["mean"] + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_sample(self, model_fn, rng, x, t, clip_denoised=True, denoised_fn=None,
                    cond_fn=None, model_kwargs=None, eta=0.0):
        """One DDIM step (reference: tools/gaussian_diffusion.py:603-651)."""
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised, denoised_fn, model_kwargs
        )
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t, model_kwargs)
        s = self.schedule
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = _extract(s.alphas_cumprod, t, x.ndim)
        alpha_bar_prev = _extract(s.alphas_cumprod_prev, t, x.ndim)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        noise = jax.random.normal(rng, x.shape, x.dtype)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma ** 2) * eps
        )
        nonzero_mask = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        sample = mean_pred + nonzero_mask * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(self, model_fn, x, t, clip_denoised=True,
                            denoised_fn=None, model_kwargs=None, eta=0.0):
        """DDIM reverse-ODE step x_t -> x_{t+1}
        (reference: tools/gaussian_diffusion.py:653-689)."""
        assert eta == 0.0, "Reverse ODE only for deterministic path"
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised, denoised_fn, model_kwargs
        )
        s = self.schedule
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar_next = _extract(s.alphas_cumprod_next, t, x.ndim)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1 - alpha_bar_next) * eps
        )
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    # ------------------------------------------------------------------ #
    # full sampling loops — lax.scan over the timestep ladder
    # ------------------------------------------------------------------ #

    def _scan_loop(self, step_fn, rng, shape, noise, dtype):
        if noise is None:
            rng, init_rng = jax.random.split(rng)
            img = jax.random.normal(init_rng, shape, dtype)
        else:
            img = noise

        indices = jnp.arange(self.num_timesteps - 1, -1, -1)

        def body(carry, i):
            img = carry
            step_rng = jax.random.fold_in(rng, i)
            t = jnp.full((img.shape[0],), i, jnp.int32)
            out = step_fn(step_rng, img, t)
            return out["sample"], None

        final, _ = jax.lax.scan(body, img, indices)
        return final

    def p_sample_loop(self, model_fn, rng, shape, noise=None, clip_denoised=True,
                      denoised_fn=None, cond_fn=None, model_kwargs=None,
                      dtype=jnp.float32):
        """Ancestral sampling as one compiled scan
        (reference loop: tools/gaussian_diffusion.py:507-601)."""
        return self._scan_loop(
            lambda r, x, t: self.p_sample(
                model_fn, r, x, t, clip_denoised, denoised_fn, cond_fn, model_kwargs
            ),
            rng, shape, noise, dtype,
        )

    def ddim_sample_loop(self, model_fn, rng, shape, noise=None, clip_denoised=True,
                         denoised_fn=None, cond_fn=None, model_kwargs=None,
                         eta=0.0, dtype=jnp.float32):
        """DDIM sampling as one compiled scan
        (reference loop: tools/gaussian_diffusion.py:691-773)."""
        return self._scan_loop(
            lambda r, x, t: self.ddim_sample(
                model_fn, r, x, t, clip_denoised, denoised_fn, cond_fn,
                model_kwargs, eta,
            ),
            rng, shape, noise, dtype,
        )

    # ------------------------------------------------------------------ #
    # losses
    # ------------------------------------------------------------------ #

    def _vb_terms_bpd(self, model_fn, x_start, x_t, t, clip_denoised=True,
                      model_kwargs=None):
        """Variational-bound term in bits
        (reference: tools/gaussian_diffusion.py:775-808)."""
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(
            model_fn, x_t, t, clip_denoised=clip_denoised, model_kwargs=model_kwargs
        )
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def sample_t(self, rng, batch_size: int) -> jnp.ndarray:
        """Uniform discrete t (reference: tools/gaussian_diffusion.py:810-816)."""
        return jax.random.randint(rng, (batch_size,), 0, self.num_timesteps)

    def compute_target(self, x_start, noise, t, x_t=None):
        """Regression target per mean type
        (reference: tools/gaussian_diffusion.py:818-832)."""
        s = self.schedule
        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            if x_t is None:
                x_t = self.q_sample(x_start, t, noise)
            return self.q_posterior_mean_variance(x_start, x_t, t)[0]
        if self.model_mean_type == ModelMeanType.START_X:
            return x_start
        if self.model_mean_type == ModelMeanType.EPSILON:
            return noise
        if self.model_mean_type == ModelMeanType.VELOCITY:
            alpha = _extract(s.sqrt_alphas_cumprod, t, x_start.ndim)
            sigma = _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
            return alpha * noise - sigma * x_start
        raise NotImplementedError(self.model_mean_type)

    def training_losses(self, model_fn, x_start, t, noise, features=None,
                        model_kwargs=None):
        """Weighted training loss for one batch
        (reference: tools/gaussian_diffusion.py:834-930). Pure: the caller
        samples `t` and `noise` (see train.Trainer); everything here fuses
        into the jitted train step. Returns a dict of per-sample [N] terms.
        """
        model_kwargs = model_kwargs or {}
        s = self.schedule
        x_t = self.q_sample(x_start, t, noise)
        terms: Dict[str, jnp.ndarray] = {}

        alpha = jnp.asarray(s.sqrt_alphas_cumprod, jnp.float32)[t]
        sigma = jnp.asarray(s.sqrt_one_minus_alphas_cumprod, jnp.float32)[t]
        mse_loss_weight = compute_mse_loss_weight(
            self.model_mean_type, self.weight_type, t, alpha, sigma,
            self.p2_k, self.p2_gamma,
        )

        if self.loss_type in (LossType.KL, LossType.RESCALED_KL):
            terms["loss"] = self._vb_terms_bpd(
                model_fn, x_start, x_t, t, clip_denoised=False,
                model_kwargs=model_kwargs,
            )["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        if self.loss_type not in (LossType.MSE, LossType.RESCALED_MSE):
            raise NotImplementedError(self.loss_type)

        raw = model_fn(x_t, self._model_t(t), **model_kwargs)
        model_output, sec_out = unpack_model_output(raw)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            c = x_t.shape[-1]
            assert model_output.shape == (*x_t.shape[:-1], 2 * c)
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            # Learn variance via the VLB without letting it move the mean
            # (reference: gaussian_diffusion.py:893-906).
            frozen_out = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
            )
            terms["vb"] = self._vb_terms_bpd(
                lambda *_args, **_kw: frozen_out,
                x_start, x_t, t, clip_denoised=False,
            )["output"]
            if self.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

        target = self.compute_target(x_start, noise, t, x_t=x_t)
        assert model_output.shape == target.shape == x_start.shape

        raw_mse = mean_flat((target - model_output.astype(jnp.float32)) ** 2)
        terms["mse"] = mse_loss_weight * raw_mse

        if self.learn_align:
            assert self.gamma > 0, "gamma must be > 0 for align loss"
            align = compute_align_loss(features, sec_out, self.align_type)
            terms["align"] = align

        # Parity note: when a learned-variance vb term is present the align
        # loss is reported in terms["align"] but NOT added to the total —
        # this reproduces the reference exactly (gaussian_diffusion.py:
        # 921-926 has the same elif chain), where REPA + learned-variance
        # silently trains without the align gradient. Divergence here would
        # change training trajectories vs the reference.
        if "vb" in terms:
            terms["loss"] = terms["mse"] + terms["vb"]
        elif self.learn_align:
            terms["loss"] = terms["mse"] + self.gamma * terms["align"]
        else:
            terms["loss"] = terms["mse"]
        return terms

    # ------------------------------------------------------------------ #
    # likelihood evaluation
    # ------------------------------------------------------------------ #

    def _prior_bpd(self, x_start):
        """Prior KL in bits/dim (reference: tools/gaussian_diffusion.py:932-948)."""
        batch = x_start.shape[0]
        t = jnp.full((batch,), self.num_timesteps - 1, jnp.int32)
        qt_mean, _, qt_log_variance = self.q_mean_variance(x_start, t)
        kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
        return mean_flat(kl_prior) / np.log(2.0)

    def calc_bpd_loop(self, model_fn, rng, x_start, clip_denoised=True,
                      model_kwargs=None):
        """Full VLB in bits/dim, scanned over all T
        (reference: tools/gaussian_diffusion.py:950-1005). Returns arrays with
        a [N, T] time axis ordered t = T-1 .. 0 like the reference loop."""
        batch = x_start.shape[0]
        indices = jnp.arange(self.num_timesteps - 1, -1, -1)

        def body(_, i):
            t = jnp.full((batch,), i, jnp.int32)
            noise = jax.random.normal(jax.random.fold_in(rng, i), x_start.shape)
            x_t = self.q_sample(x_start, t, noise)
            out = self._vb_terms_bpd(
                model_fn, x_start, x_t, t, clip_denoised, model_kwargs
            )
            eps = self._predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            return None, (
                out["output"],
                mean_flat((out["pred_xstart"] - x_start) ** 2),
                mean_flat((eps - noise) ** 2),
            )

        _, (vb, xstart_mse, mse) = jax.lax.scan(body, None, indices)
        vb = jnp.moveaxis(vb, 0, 1)
        xstart_mse = jnp.moveaxis(xstart_mse, 0, 1)
        mse = jnp.moveaxis(mse, 0, 1)
        prior_bpd = self._prior_bpd(x_start)
        return {
            "total_bpd": vb.sum(axis=1) + prior_bpd,
            "prior_bpd": prior_bpd,
            "vb": vb,
            "xstart_mse": xstart_mse,
            "mse": mse,
        }
