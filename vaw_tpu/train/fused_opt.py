"""Fused AdamW + EMA update: one loop-fusion pass per parameter leaf.

The default optax pipeline (tx.update -> updates tree -> apply_updates ->
ema_update) materializes the `updates` pytree in HBM and runs EMA as a
separate pass — ~8.1 ms/step for DiT-B/2 vs the ~5.7 ms bandwidth floor
(PERF.md). This path computes mu/nu/param/ema in one expression per leaf so
XLA emits a single fusion reading {grad, mu, nu, param, ema} and writing
{mu, nu, param, ema} — the floor.

Semantics are bit-matched to optax.adamw(learning_rate=schedule) followed
by ema_update (tests/test_fused_opt.py asserts multi-step equality):
  - bias correction with count+1 (optax scale_by_adam)
  - weight decay added to the update BEFORE lr scaling (optax adamw)
  - lr evaluated at the PRE-increment schedule count (optax
    scale_by_schedule)
The optax opt_state pytree layout (ScaleByAdamState, EmptyState,
ScaleByScheduleState) is preserved so checkpoints interoperate.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["fused_adamw_ema", "find_adam_state"]


def find_adam_state(opt_state):
    """Locate the ScaleByAdamState inside an optax chain state; returns
    (index, state)."""
    for i, s in enumerate(opt_state):
        if hasattr(s, "mu") and hasattr(s, "nu") and hasattr(s, "count"):
            return i, s
    raise ValueError("no ScaleByAdamState in opt_state — fused path "
                     "requires optax.adamw")


def _find_schedule_state(opt_state):
    for i, s in enumerate(opt_state):
        if (hasattr(s, "count") and not hasattr(s, "mu")
                and type(s).__name__ == "ScaleByScheduleState"):
            return i, s
    return None, None


def fused_adamw_ema(
    params, grads, opt_state, ema_params, *,
    lr_fn: Callable, b1: float, b2: float, eps: float, weight_decay: float,
    ema_decay: float,
) -> Tuple[Any, Any, Any]:
    """-> (new_params, new_ema, new_opt_state); one fused pass per leaf."""
    adam_i, adam = find_adam_state(opt_state)
    sched_i, sched = _find_schedule_state(opt_state)

    count = adam.count
    # safe_int32_increment saturates at int32 max instead of wrapping
    # negative — matches optax.scale_by_adam exactly.
    count_inc = optax.safe_int32_increment(count)
    bc1 = 1.0 - b1 ** count_inc.astype(jnp.float32)
    bc2 = 1.0 - b2 ** count_inc.astype(jnp.float32)
    lr_count = sched.count if sched is not None else count
    lr = lr_fn(lr_count)

    def leaf(p, g, m, v, e):
        g = g.astype(jnp.float32)
        # Update math always in f32; m/v round-trip through their storage
        # dtype (bf16 under cfg.opt_bf16_moments — the .astype on store
        # below). With f32 storage this is a no-op.
        m2 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
        v2 = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g)
        update = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
        if weight_decay:
            update = update + weight_decay * p
        p2 = p - lr * update
        e2 = e * ema_decay + p2.astype(e.dtype) * (1.0 - ema_decay)
        return p2.astype(p.dtype), m2.astype(m.dtype), v2.astype(v.dtype), e2

    out = jax.tree_util.tree_map(leaf, params, grads, adam.mu, adam.nu,
                                 ema_params)
    # unzip the 4-tuples with the param treedef
    treedef = jax.tree_util.tree_structure(params)
    flat = treedef.flatten_up_to(out)
    new_params = treedef.unflatten([t[0] for t in flat])
    new_mu = treedef.unflatten([t[1] for t in flat])
    new_nu = treedef.unflatten([t[2] for t in flat])
    new_ema = treedef.unflatten([t[3] for t in flat])

    new_opt_state = list(opt_state)
    new_opt_state[adam_i] = optax.ScaleByAdamState(
        count=count_inc, mu=new_mu, nu=new_nu)
    if sched is not None:
        new_opt_state[sched_i] = type(sched)(
            count=optax.safe_int32_increment(sched.count))
    return new_params, new_ema, tuple(new_opt_state)
