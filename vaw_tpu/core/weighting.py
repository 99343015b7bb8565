"""Variance-aware MSE loss weighting — the paper's research contribution.

Every weight_type x mean_type cell of the reference's weight library
(reference: tools/gaussian_diffusion.py:1092-1148) as a single vectorized jnp
function, plus the timestep importance samplers
(reference: tools/resample.py:24-162) re-expressed as jittable state so they
compose with a donated SPMD train step (the reference keeps numpy history on
each rank and all_gathers losses; here the history lives in the train state
and syncing is free under SPMD replication).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .types import ModelMeanType

__all__ = [
    "compute_mse_loss_weight",
    "UniformSampler",
    "LossSecondMomentResampler",
    "ResamplerState",
]


def compute_mse_loss_weight(
    model_mean_type: ModelMeanType,
    weight_type: str,
    t: jnp.ndarray,
    alpha: jnp.ndarray,
    sigma: jnp.ndarray,
    p2_k: float = 1.0,
    p2_gamma: float = 1.0,
) -> jnp.ndarray:
    """Per-sample MSE weight (reference: tools/gaussian_diffusion.py:1092-1148).

    alpha = sqrt(alpha_bar_t), sigma = sqrt(1 - alpha_bar_t) for discrete
    diffusion; for flow matching they are the interpolant coefficients.
    snr = (alpha/sigma)^2. Weights with snr == 0 are forced to 1.0
    (reference :1147).
    """
    alpha = alpha.astype(jnp.float32)
    sigma = sigma.astype(jnp.float32)
    snr = (alpha / sigma) ** 2
    ones = jnp.ones_like(snr)

    if weight_type == "constant":
        return jnp.ones(t.shape, jnp.float32)

    w = None
    name = model_mean_type.name
    if name == "EPSILON":
        if weight_type.startswith("min_snr_"):
            k = float(weight_type.split("min_snr_")[-1])
            w = jnp.minimum(snr, k) / snr
        elif weight_type.startswith("max_snr_"):
            k = float(weight_type.split("max_snr_")[-1])
            w = jnp.maximum(snr, k) / snr
        elif weight_type == "lambda":
            w = sigma
        elif weight_type == "debias":
            w = sigma / alpha
        elif weight_type == "p2":
            w = 1.0 / (p2_k + snr) ** p2_gamma
        elif weight_type == "min_debias":
            w = jnp.minimum(sigma / alpha, ones)
        elif weight_type == "max_debias":
            w = jnp.maximum(sigma / alpha, ones)
    elif name == "START_X":
        if weight_type == "trunc_snr":
            w = jnp.maximum(snr, ones)
        elif weight_type == "snr":
            w = snr
        elif weight_type == "inv_snr":
            w = 1.0 / snr
        elif weight_type.startswith("min_snr_"):
            k = float(weight_type.split("min_snr_")[-1])
            w = jnp.minimum(snr, k)
        elif weight_type.startswith("max_snr_"):
            k = float(weight_type.split("max_snr_")[-1])
            w = jnp.maximum(snr, k)
        elif weight_type == "lambda":
            w = alpha
    elif name == "VECTOR":
        if weight_type == "lambda":
            w = ones
    elif name == "VELOCITY":
        if weight_type.startswith("min_snr_"):
            k = float(weight_type.split("min_snr_")[-1])
            w = jnp.minimum(snr, k) / (snr + 1)
        elif weight_type == "lambda":
            w = alpha * sigma

    if w is None:
        raise ValueError(
            f"Invalid weight_type {weight_type!r} for mean type {name}"
        )
    # snr == 0 guard (reference :1147).
    return jnp.where(snr == 0, 1.0, w)


# ---------------------------------------------------------------------------
# Timestep importance samplers (reference: tools/resample.py). The reference
# defines these but leaves them unwired (SURVEY.md section 2.2 quirk); we keep
# them as first-class, jittable capabilities.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ResamplerState:
    """History buffer for loss-aware resampling, stored in the train state so
    it replicates for free under SPMD (reference keeps per-rank numpy arrays
    and all_gathers, tools/resample.py:84-106)."""

    loss_history: jnp.ndarray  # [T, history_per_term] f32
    loss_counts: jnp.ndarray  # [T] i32


jax.tree_util.register_dataclass(
    ResamplerState, data_fields=["loss_history", "loss_counts"], meta_fields=[]
)


class UniformSampler:
    """Uniform timestep sampling with unit importance weights
    (reference: tools/resample.py:62-68)."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, rng, batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = jax.random.randint(rng, (batch_size,), 0, self.num_timesteps)
        return t, jnp.ones((batch_size,), jnp.float32)


class LossSecondMomentResampler:
    """sqrt-E[loss^2] importance sampling with warmup
    (reference: tools/resample.py:132-162). Pure-functional: `sample` reads a
    ResamplerState, `update` folds fresh (t, loss) pairs into it."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob

    def init_state(self) -> ResamplerState:
        return ResamplerState(
            loss_history=jnp.zeros(
                (self.num_timesteps, self.history_per_term), jnp.float32
            ),
            loss_counts=jnp.zeros((self.num_timesteps,), jnp.int32),
        )

    def weights(self, state: ResamplerState) -> jnp.ndarray:
        warmed_up = jnp.all(state.loss_counts == self.history_per_term)
        w = jnp.sqrt(jnp.mean(state.loss_history ** 2, axis=-1))
        w = w / jnp.sum(w)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        return jnp.where(warmed_up, w, jnp.ones((self.num_timesteps,)) )

    def sample(self, rng, state: ResamplerState, batch_size: int):
        w = self.weights(state)
        p = w / jnp.sum(w)
        t = jax.random.choice(rng, self.num_timesteps, (batch_size,), p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t, weights

    def update(self, state: ResamplerState, ts: jnp.ndarray,
               losses: jnp.ndarray) -> ResamplerState:
        """Fold a batch of per-sample losses into the history. Processes the
        batch sequentially (matching the reference's per-item ring buffer,
        tools/resample.py:152-159) via lax.scan so it stays jittable."""

        def body(carry, tl):
            hist, counts = carry
            t, loss = tl
            count = counts[t]
            full = count == self.history_per_term
            row = hist[t]
            shifted = jnp.concatenate([row[1:], loss[None]])
            appended = row.at[jnp.minimum(count, self.history_per_term - 1)].set(loss)
            new_row = jnp.where(full, shifted, appended)
            hist = hist.at[t].set(new_row)
            counts = counts.at[t].set(jnp.where(full, count, count + 1))
            return (hist, counts), None

        (hist, counts), _ = jax.lax.scan(
            body, (state.loss_history, state.loss_counts),
            (ts.astype(jnp.int32), losses.astype(jnp.float32)),
        )
        return ResamplerState(loss_history=hist, loss_counts=counts)


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """Registry (reference: tools/resample.py:9-21)."""
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
