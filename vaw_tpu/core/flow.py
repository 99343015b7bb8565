"""Continuous-time flow matching (stochastic interpolants).

Re-design of the reference FlowMatching class
(reference: tools/gaussian_diffusion.py:1151-1419) as pure jnp functions:
interpolants, output->vector/score conversions, t-sampling, targets, weighted
training loss, and ODE/SDE samplers expressed as `lax.scan` (the reference's
Python for-loop at :1383-1408 and torchdiffeq odeint at :1362).

The reference's `ode_sample` references undefined self.rtol/self.atol
(gaussian_diffusion.py:1362) — here tolerances are explicit arguments.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax
import jax.numpy as jnp

from .diffusion import unpack_model_output
from .losses import compute_align_loss, mean_flat
from .types import ModelMeanType
from .weighting import compute_mse_loss_weight

__all__ = ["FlowMatching", "interpolant"]


def interpolant(path_type: str, t: jnp.ndarray):
    """Interpolant coefficients (alpha_t, sigma_t, d_alpha_t, d_sigma_t)
    (reference: tools/gaussian_diffusion.py:1182-1203). t in [0, 1] with
    t=0 data, t=1 noise."""
    if path_type == "linear":
        alpha_t = 1 - t
        sigma_t = t
        d_alpha_t = jnp.full_like(t, -1.0)
        d_sigma_t = jnp.full_like(t, 1.0)
    elif path_type == "cosine":
        alpha_t = jnp.cos(t * math.pi / 2)
        sigma_t = jnp.sin(t * math.pi / 2)
        d_alpha_t = -math.pi / 2 * jnp.sin(t * math.pi / 2)
        d_sigma_t = math.pi / 2 * jnp.cos(t * math.pi / 2)
    elif path_type == "linear_logsnr":
        lambda_max, lambda_min = 10.0, -10.0
        lam = lambda_max + t * (lambda_min - lambda_max)
        alpha_t = jax.nn.sigmoid(0.5 * lam)
        sigma_t = jax.nn.sigmoid(-0.5 * lam)
        d_alpha_t = -10.0 * alpha_t * sigma_t
        d_sigma_t = -d_alpha_t
    else:
        raise NotImplementedError(f"unknown path type: {path_type}")
    return alpha_t, sigma_t, d_alpha_t, d_sigma_t


def _expand_t(t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a [N] (or scalar) time onto x's rank
    (reference: tools/gaussian_diffusion.py:1173-1177)."""
    t = jnp.asarray(t, x.dtype)
    if t.ndim == 0:
        t = jnp.broadcast_to(t, (x.shape[0],))
    return t.reshape(t.shape[0], *([1] * (x.ndim - 1)))


@dataclasses.dataclass(frozen=True)
class FlowMatching:
    """Trainer + sampler for stochastic-interpolant flow models."""

    model_mean_type: ModelMeanType = ModelMeanType.VECTOR
    path_type: str = "linear"
    sampler_type: str = "sde"
    weight_type: str = "constant"
    p2_k: float = 1.0
    p2_gamma: float = 1.0
    gamma: float = 0.0
    learn_align: bool = False
    align_type: str = "mse"
    time_dist: tuple = ("uniform",)

    # -------------------------------------------------------------- #
    # conversions
    # -------------------------------------------------------------- #

    def convert_model_output_to_vector(self, model_output, x_t, t):
        """Convert the model's prediction to the flow vector field
        (reference: tools/gaussian_diffusion.py:1205-1228)."""
        alpha_t, sigma_t, d_alpha_t, d_sigma_t = interpolant(self.path_type, t)
        mt = self.model_mean_type
        if mt == ModelMeanType.START_X:
            start_x = model_output
            noise = (x_t - alpha_t * start_x) / sigma_t
        elif mt == ModelMeanType.EPSILON:
            noise = model_output
            start_x = (x_t - sigma_t * noise) / alpha_t
        elif mt == ModelMeanType.VELOCITY:
            denom = alpha_t ** 2 + sigma_t ** 2
            start_x = (alpha_t * x_t - sigma_t * model_output) / denom
            noise = (sigma_t * x_t + alpha_t * model_output) / denom
        elif mt == ModelMeanType.VECTOR:
            return model_output
        else:
            raise NotImplementedError("Unsupported model_mean_type for vector")
        return d_alpha_t * start_x + d_sigma_t * noise

    def convert_model_output_to_score(self, model_output, x_t, t):
        """Convert the model's prediction to the score
        (reference: tools/gaussian_diffusion.py:1230-1257)."""
        alpha_t, sigma_t, d_alpha_t, d_sigma_t = interpolant(self.path_type, t)
        mt = self.model_mean_type
        if mt == ModelMeanType.START_X:
            return -(x_t - alpha_t * model_output) / (sigma_t ** 2)
        if mt == ModelMeanType.EPSILON:
            return -model_output / sigma_t
        if mt == ModelMeanType.VELOCITY:
            denom = alpha_t ** 2 + sigma_t ** 2
            noise = (sigma_t * x_t + alpha_t * model_output) / denom
            return -noise / sigma_t
        if mt == ModelMeanType.VECTOR:
            noise = (d_alpha_t * x_t - alpha_t * model_output) / (
                sigma_t * d_alpha_t - alpha_t * d_sigma_t
            )
            return -noise / sigma_t
        if mt == ModelMeanType.SCORE:
            return model_output
        raise NotImplementedError("Unsupported model_mean_type for score")

    # -------------------------------------------------------------- #
    # training
    # -------------------------------------------------------------- #

    def sample_t(self, rng, batch_size: int) -> jnp.ndarray:
        """Uniform or logit-normal t
        (reference: tools/gaussian_diffusion.py:1259-1270)."""
        kind = self.time_dist[0]
        if kind == "uniform":
            return jax.random.uniform(rng, (batch_size,))
        if kind == "lognorm":
            mu, sigma = float(self.time_dist[-2]), float(self.time_dist[-1])
            z = jax.random.normal(rng, (batch_size,)) * sigma + mu
            return jax.nn.sigmoid(z)
        raise NotImplementedError(f"Unknown time_dist: {self.time_dist}")

    def q_sample(self, x_start, noise, t):
        """x_t = alpha_t x_0 + sigma_t eps
        (reference: tools/gaussian_diffusion.py:1272-1276)."""
        te = _expand_t(t, x_start)
        alpha_t, sigma_t, _, _ = interpolant(self.path_type, te)
        return alpha_t * x_start + sigma_t * noise

    def compute_target(self, x_start, noise, t):
        """Regression target per mean type
        (reference: tools/gaussian_diffusion.py:1279-1294)."""
        te = _expand_t(t, x_start)
        alpha, sigma, d_alpha, d_sigma = interpolant(self.path_type, te)
        mt = self.model_mean_type
        return {
            ModelMeanType.START_X: x_start,
            ModelMeanType.EPSILON: noise,
            ModelMeanType.VELOCITY: alpha * noise - sigma * x_start,
            ModelMeanType.VECTOR: d_alpha * x_start + d_sigma * noise,
            ModelMeanType.SCORE: -noise / sigma,
        }[mt]

    def training_losses(self, model_fn, x_start, t, noise, features=None,
                        model_kwargs=None) -> Dict[str, jnp.ndarray]:
        """Weighted flow-matching loss
        (reference: tools/gaussian_diffusion.py:1297-1340)."""
        model_kwargs = model_kwargs or {}
        alpha_t, sigma_t, _, _ = interpolant(self.path_type, t)
        x_t = self.q_sample(x_start, noise, t)
        terms: Dict[str, jnp.ndarray] = {}

        mse_loss_weight = compute_mse_loss_weight(
            self.model_mean_type, self.weight_type, t, alpha_t, sigma_t,
            self.p2_k, self.p2_gamma,
        )
        target = self.compute_target(x_start, noise, t)

        raw = model_fn(x_t, t, **model_kwargs)
        model_output, sec_out = unpack_model_output(raw)
        assert model_output.shape == target.shape == x_start.shape

        raw_mse = mean_flat((target - model_output.astype(jnp.float32)) ** 2)
        terms["mse"] = mse_loss_weight * raw_mse

        if self.learn_align:
            assert self.gamma > 0, "gamma must be > 0 for align loss"
            terms["align"] = compute_align_loss(features, sec_out, self.align_type)
            terms["loss"] = terms["mse"] + self.gamma * terms["align"]
        else:
            terms["loss"] = terms["mse"]
        return terms

    # -------------------------------------------------------------- #
    # sampling
    # -------------------------------------------------------------- #

    def _drift(self, model_fn, x, t_scalar, model_kwargs):
        te = _expand_t(t_scalar, x)
        t_vec = jnp.broadcast_to(jnp.asarray(t_scalar, x.dtype), (x.shape[0],))
        raw = model_fn(x, t_vec, **model_kwargs)
        model_output, _ = unpack_model_output(raw)
        return self.convert_model_output_to_vector(model_output, x, te)

    def compute_diffusion(self, te):
        """SDE diffusion coefficient g(t)^2 = 2 sigma_t d_sigma_t
        (reference: tools/gaussian_diffusion.py:1366-1368)."""
        _, sigma_t, _, d_sigma_t = interpolant(self.path_type, te)
        return 2 * sigma_t * d_sigma_t

    def _check_sampleable(self, ode: bool):
        """Flow sampling evaluates the drift at the path endpoints, where
        the EPSILON and (for ODE grids reaching t=0) START_X conversions
        divide by alpha_t=0 / sigma_t=0 — the reference has the identical
        singularity (gaussian_diffusion.py:1205-1228 evaluated on its
        linspace(1,0) grid) and returns all-NaN batches. Fail loudly at
        sampler entry instead."""
        mt = self.model_mean_type
        if mt == ModelMeanType.EPSILON:
            raise ValueError(
                "flow sampling with mean_type EPSILON is singular at t=1 "
                "(alpha_t=0 -> NaN on the first drift eval; the reference "
                "NaNs identically). Train/sample flow models with "
                "--mean_type VECTOR (or VELOCITY/START_X for SDE).")
        if ode and mt == ModelMeanType.START_X:
            raise ValueError(
                "flow ODE sampling with mean_type START_X is singular at "
                "t=0 (sigma_t=0 on the final drift eval). Use the SDE "
                "sampler (its last eval is at t=0.04) or VECTOR/VELOCITY.")

    def ode_sample(self, model_fn, noise, num_steps=50, solver="heun",
                   model_kwargs=None, rtol=1e-3, atol=1e-6):
        """Probability-flow ODE from t=1 to t=0.

        Fixed-step Euler/Heun run as a `lax.scan` (the reference delegates to
        torchdiffeq odeint, gaussian_diffusion.py:1354-1363); 'dopri5' runs
        an adaptive Dormand-Prince RK45 under `lax.while_loop` with explicit
        rtol/atol — the reference's ode_sample reads undefined
        self.rtol/self.atol (gaussian_diffusion.py:1362), fixed here by
        taking them as arguments."""
        model_kwargs = model_kwargs or {}
        self._check_sampleable(ode=True)
        if solver == "dopri5":
            return self._dopri5(model_fn, noise, model_kwargs, rtol, atol)
        ts = jnp.linspace(1.0, 0.0, num_steps)

        def body(x, tt):
            t_cur, t_next = tt
            h = t_next - t_cur
            d_cur = self._drift(model_fn, x, t_cur, model_kwargs)
            if solver == "euler":
                return x + h * d_cur, None
            x_pred = x + h * d_cur
            d_next = self._drift(model_fn, x_pred, t_next, model_kwargs)
            return x + 0.5 * h * (d_cur + d_next), None

        x, _ = jax.lax.scan(body, noise, (ts[:-1], ts[1:]))
        return x

    def _dopri5(self, model_fn, noise, model_kwargs, rtol, atol,
                max_steps: int = 512):
        """Adaptive Dormand-Prince 5(4) with FSAL, integrating t: 1 -> 0.
        Static-shape TPU formulation: a bounded `lax.while_loop` whose body
        either accepts a step (PI-controlled growth) or retries with a
        smaller h; all shapes fixed."""
        # Butcher tableau (Dormand-Prince).
        c = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
        a = [
            [],
            [1 / 5],
            [3 / 40, 9 / 40],
            [44 / 45, -56 / 15, 32 / 9],
            [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
            [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
            [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
        ]
        b5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
                        11 / 84, 0.0])
        b4 = jnp.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                        -92097 / 339200, 187 / 2100, 1 / 40])

        def f(x, t):
            return self._drift(model_fn, x, t, model_kwargs)

        def cond(carry):
            x, t, h, k1, step = carry
            return (t > 1e-6) & (step < max_steps)

        def body(carry):
            x, t, h, k1, step = carry
            h = jnp.maximum(h, 1e-5)  # floor to bound iteration count
            h = jnp.minimum(h, t)     # don't overshoot t=0
            dt = -h  # integrating backward in time (t: 1 -> 0)
            ks = [k1]
            for i in range(1, 7):
                xi = x
                for j, aij in enumerate(a[i]):
                    xi = xi + dt * aij * ks[j]
                ks.append(f(xi, t + dt * c[i]))
            x5 = x
            x4 = x
            for i in range(7):
                x5 = x5 + dt * b5[i] * ks[i]
                x4 = x4 + dt * b4[i] * ks[i]
            err = x5 - x4
            scale = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(x5))
            err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))
            accept = err_norm <= 1.0
            factor = jnp.clip(
                0.9 * (1.0 / jnp.maximum(err_norm, 1e-10)) ** 0.2, 0.2, 5.0
            )
            new_h = h * factor
            new_x = jnp.where(accept, x5, x)
            new_t = jnp.where(accept, t - h, t)
            # FSAL: k7 is the derivative at the accepted point.
            new_k1 = jnp.where(accept, ks[6], k1)
            return (new_x, new_t, new_h, new_k1, step + 1)

        t0 = jnp.asarray(1.0)
        k1 = f(noise, t0)
        x, t, h, _, steps = jax.lax.while_loop(
            cond, body, (noise, t0, jnp.asarray(0.05), k1, jnp.asarray(0))
        )
        # The h >= 1e-5 floor and max_steps budget bound compile-time
        # iteration count; a stiff trajectory that exhausts them would
        # otherwise return an unconverged answer marked as success. Signal
        # loudly at runtime (jit-compatible).
        unconverged = t > 1e-6
        jax.lax.cond(
            unconverged,
            lambda: jax.debug.print(
                "[flow] WARNING: dopri5 budget exhausted at t={t:.4g} after "
                "{s} steps (max_steps={m}); result is UNCONVERGED — raise "
                "max_steps or loosen rtol/atol", t=t, s=steps, m=max_steps),
            lambda: None,
        )
        return x

    def sde_sample(self, model_fn, rng, noise, num_steps=50, solver="heun",
                   model_kwargs=None):
        """Euler/Heun SDE sampler with a deterministic last step
        (reference: tools/gaussian_diffusion.py:1371-1409): integrate from
        t=1 to t=0.04 stochastically, then one drift-only step to t=0."""
        model_kwargs = model_kwargs or {}
        self._check_sampleable(ode=False)
        ts = jnp.concatenate([jnp.linspace(1.0, 0.04, num_steps),
                              jnp.zeros((1,))])

        def drift_fn(x, t_scalar, diffusion):
            te = _expand_t(t_scalar, x)
            t_vec = jnp.broadcast_to(jnp.asarray(t_scalar, x.dtype), (x.shape[0],))
            raw = model_fn(x, t_vec, **model_kwargs)
            model_output, _ = unpack_model_output(raw)
            score = self.convert_model_output_to_score(model_output, x, te)
            vector = self.convert_model_output_to_vector(model_output, x, te)
            return vector - 0.5 * diffusion * score

        def body(carry, inp):
            x = carry
            i, t_cur, t_next = inp
            h = t_next - t_cur
            te = _expand_t(t_cur, x)
            diffusion = self.compute_diffusion(te)
            d_cur = drift_fn(x, t_cur, diffusion)
            eps = jax.random.normal(jax.random.fold_in(rng, i), x.shape, x.dtype)
            noise_term = jnp.sqrt(diffusion) * eps * jnp.sqrt(jnp.abs(h))
            if solver == "euler":
                x_new = x + d_cur * h + noise_term
            elif solver == "heun":
                x_pred = x + d_cur * h + noise_term
                te_next = _expand_t(t_next, x)
                diffusion_next = self.compute_diffusion(te_next)
                d_next = drift_fn(x_pred, t_next, diffusion_next)
                x_new = x + 0.5 * (d_cur + d_next) * h + noise_term
            else:
                raise ValueError(f"Unknown solver: {solver}")
            return x_new, None

        # Stochastic steps over [1.0 .. 0.04].
        steps = jnp.arange(num_steps - 1)
        x, _ = jax.lax.scan(body, noise, (steps, ts[:-2], ts[1:-1]))

        # Final deterministic step 0.04 -> 0.
        t_cur, t_next = ts[-2], ts[-1]
        te = _expand_t(t_cur, x)
        diffusion = self.compute_diffusion(te)
        d_cur = drift_fn(x, t_cur, diffusion)
        return x + d_cur * (t_next - t_cur)

    def sample(self, model_fn, rng, noise, num_steps=50, solver="heun",
               model_kwargs=None, rtol=1e-3, atol=1e-6):
        """Dispatch on sampler_type
        (reference: tools/gaussian_diffusion.py:1412-1419)."""
        if self.sampler_type == "ode":
            return self.ode_sample(model_fn, noise, num_steps, solver,
                                   model_kwargs, rtol=rtol, atol=atol)
        if self.sampler_type == "sde":
            return self.sde_sample(model_fn, rng, noise, num_steps, solver,
                                   model_kwargs)
        raise NotImplementedError(f"Unsupported sampler_type: {self.sampler_type}")
