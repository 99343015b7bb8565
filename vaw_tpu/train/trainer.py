"""The jitted SPMD train step.

TPU-first re-design of the reference Trainer (reference:
tools/trainer.py:28-150): everything from q_sample through the AdamW update
and EMA fold is ONE donated jitted function over the mesh. The reference's
AMP autocast + GradScaler (trainer.py:104-112) becomes a bf16 compute policy
(no loss scaler needed on TPU); DDP no_sync grad accumulation
(trainer.py:94-103) becomes a `lax.scan` over micro-batches with a single
gradient reduction; rank-0 EMA + broadcast (trainer.py:64-66) becomes a
replicated EMA fold in the state.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.diffusion import GaussianDiffusion
from ..parallel.mesh import replicated_sharding
from ..parallel.partition import (
    fsdp_param_shardings,
    param_shardings,
    tree_shardings_like,
)
from .state import TrainState, ema_update

__all__ = ["warmup_cosine_lr", "make_optimizer", "Trainer",
           "sample_from_latent"]


def warmup_cosine_lr(cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr(step) = lr * lambda(step) with linear warmup and optional cosine
    decay to final_lr (reference: tools/utils.py:75-90)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(cfg.warmup_steps, 1)
        if cfg.cosine_decay:
            progress = (step - cfg.warmup_steps) / max(
                cfg.total_steps - cfg.warmup_steps, 1
            )
            cos = 0.5 * (1 + jnp.cos(math.pi * progress))
            after = (cfg.final_lr + (cfg.lr - cfg.final_lr) * cos) / cfg.lr
        else:
            after = jnp.asarray(1.0)
        lam = jnp.where(step < cfg.warmup_steps, warm, after)
        if cfg.warmup_steps == 0:
            lam = after
        return cfg.lr * lam

    return schedule


def make_optimizer(cfg) -> optax.GradientTransformation:
    """AdamW + optional global-norm clip (reference: main.py:354-355,
    tools/trainer.py:59-61)."""
    tx = optax.adamw(
        learning_rate=warmup_cosine_lr(cfg),
        b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
        weight_decay=cfg.weight_decay,
    )
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def sample_from_latent(rng, latent, latent_scale=1.0):
    """Re-sample stored VAE moments: latent = [mean | std] on the channel
    axis -> (mean + std * eps) * scale (reference: tools/trainer.py:21-25;
    storage layout preprocessing/encode_latent.py:95-100)."""
    mean, std = jnp.split(latent, 2, axis=-1)
    eps = jax.random.normal(rng, mean.shape, mean.dtype)
    return (mean + std * eps) * latent_scale


class Trainer:
    """Builds and owns the jitted train step.

    `process` is a GaussianDiffusion or FlowMatching; `model` a Flax module
    following the (x, t, y) contract; `mesh` a ('data','model') Mesh.
    """

    def __init__(self, cfg, model, process, mesh, base_rng=None,
                 encoder_fn=None, apply_fn=None):
        self.cfg = cfg
        self.model = model
        self.process = process
        self.mesh = mesh
        # Optional drop-in replacement for model.apply — e.g. the
        # pipeline-parallel DiT forward (parallel/dit_pipeline.py).
        self.apply_fn = apply_fn
        self.tx = make_optimizer(cfg)
        self.base_rng = (
            base_rng if base_rng is not None else jax.random.key(cfg.seed)
        )
        # Frozen REPA teacher closure (pixels -> token features); compiled
        # into the train step with stop_gradient (the reference runs the
        # teacher per micro-batch outside autocast, tools/trainer.py:82-90).
        self.encoder_fn = encoder_fn
        # Optional loss-aware timestep importance sampler (the reference
        # defines but never wires these, tools/resample.py — first-class
        # here via cfg.time_sampler = "loss-second-moment").
        self.resampler = None
        sampler_name = getattr(cfg, "time_sampler", "uniform")
        if (sampler_name == "loss-second-moment"
                and isinstance(process, GaussianDiffusion)):
            from ..core.weighting import LossSecondMomentResampler

            self.resampler = LossSecondMomentResampler(
                process.num_timesteps
            )
        self._jitted = None
        self._param_shardings = None

    def _constrain_batch_sharding(self, tree):
        """Pin model outputs to batch-over-'data' sharding. Without this,
        SPMD propagation under fsdp+tp picks a feature-dim sharding for the
        FinalLayer bias add (inherited from the ZeRO-sharded bias) and then
        emits an involuntary full rematerialization (replicate + repartition)
        to reach the consumer's layout — visible as a spmd_partitioner.cc
        warning in the multichip dryrun. Only the fsdp plain-apply path is
        pinned: pp/sp apply_fns (self.apply_fn) manage their own stage/
        sequence shardings, and under plain dp/tp propagation already lands
        on batch sharding (pinning there was measured on the 8-device
        dryrun census to roughly 90x the collective-permute count and
        break dp-vs-fsdp loss bit-equality)."""
        if (self.apply_fn is not None
                or not getattr(self.cfg, "fsdp", False)
                or "data" not in self.mesh.shape):
            return tree
        sh = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec("data"))
        # Batch-leading rank>=1 leaves only: a rank-0 aux leaf would fail
        # the rank-1 spec at trace time, and this pin is only meaningful
        # for batch-major outputs (DiT/MM-DiT return (x, zs), all
        # batch-leading).
        return jax.tree_util.tree_map(
            lambda a: (jax.lax.with_sharding_constraint(a, sh)
                       if getattr(a, "ndim", 0) >= 1 else a), tree)

    def _use_fused_opt(self) -> bool:
        """Fused AdamW+EMA applies when nothing needs the intermediate
        updates tree: no grad clipping (the optax chain handles that) and
        not explicitly disabled."""
        return (not self.cfg.grad_clip
                and getattr(self.cfg, "fused_optimizer", True))

    # ------------------------------------------------------------- #
    # state init
    # ------------------------------------------------------------- #

    def init_state(self, rng, sample_batch) -> TrainState:
        x = sample_batch["image"]
        if self.cfg.in_chans == 4 and x.shape[-1] == 2 * self.cfg.in_chans:
            x = x[..., : self.cfg.in_chans]
        t = jnp.zeros((x.shape[0],), jnp.float32)
        y = sample_batch.get("label")
        args = (x, t) if y is None else (x, t, y)
        variables = self.model.init(
            {"params": rng, "label_dropout": jax.random.fold_in(rng, 1),
             "dropout": jax.random.fold_in(rng, 2)},
            *args,
        )
        params = variables["params"]
        # EMA starts as a deep copy — distinct buffers, or donating the state
        # would donate the same buffer twice (f(donate(a), donate(a))).
        ema = jax.tree_util.tree_map(jnp.copy, params)
        opt_state = self.tx.init(params)
        if getattr(self.cfg, "opt_bf16_moments", False):
            # bf16 moment STORAGE (update math stays f32 in fused_opt.leaf);
            # params/EMA remain f32 masters. ~22% less optimizer HBM
            # traffic; loss trajectory drift is bounded by
            # tests/test_fused_opt.py::test_bf16_moments_close_to_f32.
            # Explicit raise (not assert): the optax chain was never
            # validated with bf16 mu/nu, and python -O would strip an
            # assert and silently fall through into it.
            if not self._use_fused_opt():
                raise ValueError(
                    "--opt_bf16_moments requires the fused optimizer "
                    "(--fused_optimizer True, no --grad_clip)")
            from .fused_opt import find_adam_state

            i, adam = find_adam_state(opt_state)
            cast = functools.partial(jax.tree_util.tree_map,
                                     lambda a: a.astype(jnp.bfloat16))
            opt_state = list(opt_state)
            opt_state[i] = optax.ScaleByAdamState(
                count=adam.count, mu=cast(adam.mu), nu=cast(adam.nu))
            opt_state = tuple(opt_state)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=ema,
            opt_state=opt_state,
            resampler=(
                self.resampler.init_state() if self.resampler else None
            ),
        )
        return self.shard_state(state)

    def param_shardings(self):
        """NamedSharding tree for the params: TP rules, extended with
        ZeRO-3 sharding over 'data' when cfg.fsdp (the reference keeps full
        AdamW replicas per rank, main.py:354; FSDP is the TPU extension)."""
        if self._param_shardings is None:
            raise RuntimeError("call init_state/shard_state first")
        return self._param_shardings

    def shard_state(self, state: TrainState) -> TrainState:
        """Place params/EMA/opt-state on the mesh: TP (+FSDP) shardings for
        params and EMA, matching shardings for the Adam moments, replicated
        scalars."""
        # Loud TP: with model_axis > 1 a model whose module names miss every
        # rule must fail, not silently replicate.
        from ..parallel.partition import assert_tp_rules_applied

        assert_tp_rules_applied(state.params,
                                int(self.mesh.shape.get("model", 1)))
        if "stage" in self.mesh.shape:
            from ..parallel.partition import pp_param_shardings

            assert not getattr(self.cfg, "fsdp", False), (
                "fsdp+pp composition is not supported; run pp with dp only"
            )
            p_sh = pp_param_shardings(self.mesh, state.params)
        elif "model" not in self.mesh.shape:
            # sp (or other custom) mesh without a tensor-parallel axis:
            # params replicate — the name-based TP rules reference 'model'
            if getattr(self.cfg, "fsdp", False):
                # not an assert: config validation must survive python -O
                raise ValueError(
                    "fsdp needs a ('data','model') mesh; on this "
                    f"{tuple(self.mesh.axis_names)} mesh params would "
                    "silently replicate instead of ZeRO-sharding"
                )
            rep = replicated_sharding(self.mesh)
            p_sh = jax.tree_util.tree_map(lambda _: rep, state.params)
        elif getattr(self.cfg, "fsdp", False):
            p_sh = fsdp_param_shardings(self.mesh, state.params)
        else:
            p_sh = param_shardings(self.mesh, state.params)
        self._param_shardings = p_sh
        rep = replicated_sharding(self.mesh)

        def put_like(tree, sh_tree):
            return jax.tree_util.tree_map(jax.device_put, tree, sh_tree)

        params = put_like(state.params, p_sh)
        ema = put_like(state.ema_params, p_sh)
        # Adam moments mirror the param shardings (ZeRO-2/3 optimizer-state
        # sharding under fsdp); other opt-state leaves replicate.
        opt_sh = tree_shardings_like(
            state.opt_state, jax.tree_util.tree_structure(state.params),
            p_sh, rep,
        )
        opt_state = put_like(state.opt_state, opt_sh)
        return TrainState(
            step=jax.device_put(state.step, rep), params=params,
            ema_params=ema, opt_state=opt_state,
            resampler=state.resampler,
        )

    # ------------------------------------------------------------- #
    # loss
    # ------------------------------------------------------------- #

    def _loss_fn(self, params, batch, rng, resampler_state=None
                 ) -> Tuple[jnp.ndarray, Dict]:
        cfg = self.cfg
        x = batch["image"].astype(jnp.float32)
        y = batch.get("label")
        features = batch.get("features")
        if features is None and cfg.learn_align and self.encoder_fn is not None:
            # Teacher features from stored pixels (Latent_Pixel) or from the
            # images themselves rescaled to [0, 255]
            # (reference: tools/trainer.py:82-90).
            from ..encoders.align import get_feature

            pixels = batch.get("pixels")
            if pixels is None:
                if x.shape[-1] not in (1, 3):
                    raise ValueError(
                        "REPA align needs teacher pixels: the batch has no "
                        f"'pixels' key and x has {x.shape[-1]} channels "
                        "(latent moments, not an image) — use a "
                        "Latent_Pixel dataset that stores pixels")
                pixels = (x + 1.0) * 127.5
            features = get_feature(cfg.enc_type, pixels, self.encoder_fn)

        rngs = {
            "t": jax.random.fold_in(rng, 0),
            "noise": jax.random.fold_in(rng, 1),
            "latent": jax.random.fold_in(rng, 2),
            "dropout": jax.random.fold_in(rng, 3),
            "label_dropout": jax.random.fold_in(rng, 4),
        }

        # VAE-moment re-sampling for latent training
        # (reference: tools/trainer.py:91-92).
        if cfg.in_chans == 4 and x.shape[-1] == 2 * cfg.in_chans:
            x = sample_from_latent(rngs["latent"], x, cfg.latent_scale)

        apply = self.apply_fn if self.apply_fn is not None else self.model.apply

        def model_fn(xt, t, **kwargs):
            out = apply(
                {"params": params}, xt, t,
                train=True,
                rngs={"dropout": rngs["dropout"],
                      "label_dropout": rngs["label_dropout"]},
                **kwargs,
            )
            return self._constrain_batch_sharding(out)

        if self.resampler is not None and resampler_state is not None:
            # Importance-sampled timesteps with unbiasing weights
            # (reference: tools/resample.py:44-59).
            t, importance_w = self.resampler.sample(
                rngs["t"], resampler_state, x.shape[0]
            )
        else:
            t = self.process.sample_t(rngs["t"], x.shape[0])
            importance_w = None
        noise = jax.random.normal(rngs["noise"], x.shape, jnp.float32)
        model_kwargs = {"y": y} if (cfg.class_cond and y is not None) else {}
        terms = self.process.training_losses(
            model_fn, x, t, noise, features=features, model_kwargs=model_kwargs
        )
        per_sample = terms["loss"]
        if importance_w is not None:
            loss = jnp.mean(importance_w * per_sample)
        else:
            loss = jnp.mean(per_sample)
        metrics = {k: jnp.mean(v) for k, v in terms.items()}
        metrics["_t"] = t
        metrics["_per_sample_loss"] = per_sample
        return loss, metrics

    # ------------------------------------------------------------- #
    # step
    # ------------------------------------------------------------- #

    def _train_step(self, state: TrainState, batch, rng):
        cfg = self.cfg
        accum = max(1, cfg.grad_accumulation)
        grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)

        if accum == 1:
            (loss, metrics), grads = grad_fn(
                state.params, batch, rng, state.resampler
            )
            ts_aux = metrics.pop("_t", None)
            loss_aux = metrics.pop("_per_sample_loss", None)
        else:
            # Micro-batch scan (replaces DDP no_sync accumulation,
            # reference tools/trainer.py:94-103). Leading axis: [accum, B/accum].
            def split(x):
                return x.reshape(accum, x.shape[0] // accum, *x.shape[1:])

            micro = jax.tree_util.tree_map(split, batch)

            def body(carry, inp):
                i, mb = inp
                (loss, metrics), grads = grad_fn(
                    state.params, mb, jax.random.fold_in(rng, i),
                    state.resampler,
                )
                # per-sample aux arrays are STACKED (scan outputs), not
                # summed — they feed the loss-aware timestep resampler.
                aux = (metrics.pop("_t", None),
                       metrics.pop("_per_sample_loss", None))
                acc_grads, acc_loss, acc_metrics = carry
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                acc_loss = acc_loss + loss
                acc_metrics = jax.tree_util.tree_map(
                    jnp.add, acc_metrics, metrics
                )
                return (acc_grads, acc_loss, acc_metrics), aux

            (l0, m0), g0 = grad_fn(
                state.params,
                jax.tree_util.tree_map(lambda x: x[0], micro),
                jax.random.fold_in(rng, 0),
                state.resampler,
            )
            aux0 = (m0.pop("_t", None), m0.pop("_per_sample_loss", None))
            rest = jax.tree_util.tree_map(lambda x: x[1:], micro)
            (grads, loss, metrics), aux_rest = jax.lax.scan(
                body, (g0, l0, m0),
                (jnp.arange(1, accum), rest),
            )
            inv = 1.0 / accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss * inv
            metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)
            if aux0[0] is not None:
                ts_aux = jnp.concatenate(
                    [aux0[0][None], aux_rest[0]]
                ).reshape(-1)
                loss_aux = jnp.concatenate(
                    [aux0[1][None], aux_rest[1]]
                ).reshape(-1)
            else:
                ts_aux = loss_aux = None

        # Fold this batch's per-timestep losses into the resampler history
        # (replaces update_with_local_losses + all_gather,
        # reference tools/resample.py:71-112 — SPMD computes identical
        # updates on every chip). Under grad accumulation the per-microbatch
        # (t, loss) pairs are stacked by the scan and folded in together.
        new_resampler = state.resampler
        if (self.resampler is not None and state.resampler is not None
                and ts_aux is not None):
            new_resampler = self.resampler.update(
                state.resampler, ts_aux, loss_aux
            )

        if self._use_fused_opt():
            # Single fused pass per leaf (train/fused_opt.py): optax's
            # update->apply->ema chain costs ~40% extra HBM traffic.
            from .fused_opt import fused_adamw_ema

            new_params, new_ema, new_opt_state = fused_adamw_ema(
                state.params, grads, state.opt_state, state.ema_params,
                lr_fn=warmup_cosine_lr(cfg), b1=cfg.betas[0],
                b2=cfg.betas[1], eps=cfg.eps, weight_decay=cfg.weight_decay,
                ema_decay=cfg.ema_decay,
            )
        else:
            updates, new_opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            new_ema = ema_update(new_params, state.ema_params, cfg.ema_decay)
        metrics["loss"] = loss
        if getattr(cfg, "log_grad_norm", True):
            # an extra full read of the grads — skippable for benchmarks
            metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1, params=new_params, ema_params=new_ema,
            opt_state=new_opt_state, resampler=new_resampler,
        )
        return new_state, metrics

    @property
    def jitted_step(self):
        if self._jitted is None:
            self._jitted = jax.jit(self._train_step, donate_argnums=(0,))
        return self._jitted

    def step(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        """One optimizer step. `batch` leaves should already be device-put
        with the batch axis sharded over 'data' (parallel.shard_batch)."""
        rng = jax.random.fold_in(self.base_rng, state.step)
        return self.jitted_step(state, batch, rng)
