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
        """Fold a batch of per-sample losses into the history, matching the
        reference's sequential per-item ring buffer bit-for-bit
        (tools/resample.py:152-159) but fully vectorized: a per-item
        lax.scan put O(batch) dependent scatter updates on the critical
        path (~256 serial steps at batch 256); this formulation is one
        stable sort over the batch plus one gather and one scatter over the
        [T, H] table (tests/test_weighting.py asserts equality with the
        sequential semantics).

        Per-row view of the sequential semantics: with k_t new losses for
        timestep t arriving in batch order, the final row holds the last H
        entries of (old valid entries ++ new losses); the final count is
        min(count_t + k_t, H)."""
        H = self.history_per_term
        T = self.num_timesteps
        ts = ts.astype(jnp.int32)
        losses = losses.astype(jnp.float32)
        hist, counts = state.loss_history, state.loss_counts

        k = jnp.zeros((T,), jnp.int32).at[ts].add(1)  # arrivals per row
        new_counts = jnp.minimum(counts + k, H)
        shift = jnp.maximum(counts + k - H, 0)  # old entries dropped per row

        # Shift each row left by its own amount (clamped gather; positions
        # past the valid region are either overwritten by the scatter below
        # or past new_count, i.e. stale-by-construction like the reference).
        cols = jnp.arange(H)[None, :] + shift[:, None]
        hist = jnp.take_along_axis(hist, jnp.minimum(cols, H - 1), axis=1)

        # Stable-sort the batch by timestep; an item's rank-from-the-end
        # within its group determines its destination column (only the last
        # H arrivals per row survive, exactly as the sequential ring would
        # leave them).
        order = jnp.argsort(ts, stable=True)
        ts_s, losses_s = ts[order], losses[order]
        group_start = jnp.searchsorted(ts_s, ts_s, side="left")
        rank = jnp.arange(ts.shape[0]) - group_start
        from_end = k[ts_s] - 1 - rank
        dest = new_counts[ts_s] - 1 - from_end
        # from_end >= H: overwritten in the sequential semantics — drop via
        # an out-of-bounds column (mode="drop").
        dest = jnp.where(from_end < H, dest, H)
        hist = hist.at[ts_s, dest].set(losses_s, mode="drop")
        return ResamplerState(loss_history=hist, loss_counts=new_counts)


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """Registry (reference: tools/resample.py:9-21)."""
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
