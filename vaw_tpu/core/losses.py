"""Likelihood losses and representation-alignment (REPA) losses.

normal_kl / discretized Gaussian NLL reference: tools/losses.py:12-77.
Align losses reference: tools/gaussian_diffusion.py:1007-1057.
All functions are pure jnp and fuse under jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "normal_kl",
    "approx_standard_normal_cdf",
    "discretized_gaussian_log_likelihood",
    "mean_flat",
    "compute_align_loss",
    "projection_loss",
]


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes (reference: tools/nn.py:86-90)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two Gaussians, broadcasting all args
    (reference: tools/losses.py:12-39)."""
    mean1, logvar1, mean2, logvar2 = map(jnp.asarray, (mean1, logvar1, mean2, logvar2))
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """Tanh approximation of the standard normal CDF
    (reference: tools/losses.py:42-47)."""
    return 0.5 * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of uint8 images (scaled to [-1,1]) under a Gaussian
    discretized to 256 buckets (reference: tools/losses.py:50-77)."""
    means = jnp.broadcast_to(means, x.shape)
    log_scales = jnp.broadcast_to(log_scales, x.shape)
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))
        ),
    )
    return log_probs


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(
        jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), eps)
    )


def compute_align_loss(target, output, align_type: str, temperature: float = 0.1):
    """REPA alignment losses between frozen-teacher features `target` and the
    model's projector output `output`, both [N, T, D]
    (reference: tools/gaussian_diffusion.py:1007-1046)."""
    if align_type == "cosine":
        t = _l2_normalize(target)
        o = _l2_normalize(output)
        return -jnp.mean(jnp.sum(t * o, axis=-1))

    if align_type == "mse":
        return jnp.mean((output - target) ** 2)

    if align_type == "mse_l2":
        t = _l2_normalize(target)
        o = _l2_normalize(output)
        return jnp.mean((o - t) ** 2)

    if align_type == "nt_xent":
        assert temperature > 0, "temperature must be > 0"
        n, t_len, d = target.shape
        b = n * t_len
        tgt = _l2_normalize(target.reshape(b, d), axis=1)
        out = _l2_normalize(output.reshape(b, d), axis=1)
        logits = (out @ tgt.T) / temperature  # [B, B]
        labels = jnp.arange(b)
        # Symmetric InfoNCE: cross-entropy with the diagonal as positives.
        loss_i = -jnp.mean(
            jax.nn.log_softmax(logits, axis=-1)[labels, labels]
        )
        loss_j = -jnp.mean(
            jax.nn.log_softmax(logits.T, axis=-1)[labels, labels]
        )
        return 0.5 * (loss_i + loss_j)

    raise ValueError(f"Unknown align loss type: {align_type}.")


def projection_loss(z, z_tilde):
    """Negative mean cosine similarity
    (reference: tools/gaussian_diffusion.py:1048-1052)."""
    z = _l2_normalize(z)
    z_tilde = _l2_normalize(z_tilde)
    return -jnp.mean(jnp.sum(z * z_tilde, axis=-1))
