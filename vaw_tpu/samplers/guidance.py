"""Guidance wrappers: classifier-free (interval) guidance and classifier
gradient guidance.

TPU re-design of the reference wrappers (reference: tools/sampler.py:10-89):
IntervalCFG's Python-side interval check (`_use_cfg(float(t.mean()))`,
sampler.py:27-31) is hoisted out of the compiled loop — each sampler step
receives a per-step guidance scale g (g=1 disables guidance exactly:
uncond + 1*(cond-uncond) == cond), precomputed host-side from the step's
time value, so the scan body stays branch-free. Classifier guidance uses
jax.grad instead of torch.autograd.grad (sampler.py:82-89).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["IntervalCFG", "cfg_scale_for_time", "classifier_cond_fn"]


def cfg_scale_for_time(time_value: float, guidance_scale: float,
                       interval: Tuple[float, float]) -> float:
    """Host-side per-step guidance scale (reference: tools/sampler.py:27-31):
    full scale inside [t_from, t_to) (or everywhere when the interval is
    disabled with negative bounds), 1.0 outside."""
    if abs(guidance_scale - 1.0) < 1e-8:
        return 1.0
    t_from, t_to = interval
    if t_from >= 0 and t_to > t_from:
        return guidance_scale if t_from <= time_value < t_to else 1.0
    return guidance_scale


class IntervalCFG:
    """Classifier-free guidance by batch doubling
    (reference: tools/sampler.py:33-48). Wraps a model_fn(x, t, y=...) into
    fn(x, t, y, g): [cond; null] double batch -> uncond + g*(cond-uncond).
    When class conditioning is off it reduces to the raw model.

    Parity note: like the reference (sampler.py:47-48), the combination is
    applied to the FULL model output — for learn_sigma models that includes
    the learned-variance channels, which DiT-style forward_with_cfg would
    instead take from the cond half. We reproduce the reference's choice
    exactly; divergence here would change sampled trajectories.

    The per-call scale g can be passed explicitly (EDM path, host-planned) or
    derived in-graph from t against the finite guidance interval — a
    branch-free jnp.where instead of the reference's Python float() check."""

    def __init__(self, model_fn: Callable, num_classes: int,
                 guidance_scale: float = 1.0,
                 interval: Tuple[float, float] = (-1.0, -1.0),
                 class_cond: bool = True):
        self.model_fn = model_fn
        self.null_label = int(num_classes)
        self.guidance_scale = float(guidance_scale)
        self.interval = interval
        self.class_cond = class_cond

    def _scale_from_time(self, t):
        """In-graph twin of cfg_scale_for_time — same interval rule, with
        the inside/outside selection as a traceable jnp.where. Any change
        to the interval semantics must be made in BOTH (the EDM path plans
        g host-side via cfg_scale_for_time; DDIM/flow derive it here)."""
        if abs(self.guidance_scale - 1.0) < 1e-8:
            return 1.0
        t_from, t_to = self.interval
        if t_from >= 0 and t_to > t_from:
            tv = jnp.mean(t.astype(jnp.float32))
            return jnp.where((tv >= t_from) & (tv < t_to),
                             self.guidance_scale, 1.0)
        return self.guidance_scale

    def __call__(self, x, t, y=None, g=None):
        if not self.class_cond or y is None:
            out = self.model_fn(x, t)
            return out[0] if isinstance(out, tuple) else out
        if abs(self.guidance_scale - 1.0) < 1e-8:
            # Guidance at scale 1 is exactly the conditional model
            # (uncond + 1*(cond-uncond) == cond; the interval can only gate
            # the scale further down to 1) — skip the doubled forward. The
            # default eval protocol samples at scale 1.0 (reference:
            # main.py:116), so this halves its NFE.
            out = self.model_fn(x, t, y=y)
            return out[0] if isinstance(out, tuple) else out
        if g is None:
            g = self._scale_from_time(t)
        y_null = jnp.full_like(y, self.null_label)
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        y2 = jnp.concatenate([y, y_null], axis=0)
        out = self.model_fn(x2, t2, y=y2)
        out = out[0] if isinstance(out, tuple) else out
        cond, uncond = jnp.split(out, 2, axis=0)
        return uncond + g * (cond - uncond)


def classifier_cond_fn(classifier_fn: Callable, scale: float = 1.0):
    """grad_x log p(y|x) of a noisy classifier
    (reference: tools/sampler.py:82-89): cond_fn(x, t, y) for
    GaussianDiffusion.condition_mean / condition_score."""

    def cond_fn(x, t, y=None, **kwargs):
        assert y is not None

        def log_prob(xi):
            logits = classifier_fn(xi, t)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return jnp.sum(jnp.take_along_axis(logp, y[:, None], axis=1))

        return jax.grad(log_prob)(x) * scale

    return cond_fn
