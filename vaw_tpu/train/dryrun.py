"""Multi-chip dry run: jit the FULL train step over an n-device mesh.

Validates the SPMD design (dp x tp shardings, collectives, donated state)
without real multi-chip hardware — the driver runs this with
xla_force_host_platform_device_count virtual CPU devices.

Driver-budget contract (VERDICT r4 next-1): every leg prints
`[leg] <name> start` / `[leg] <name> done <elapsed>s` so a timeout names
its culprit; partial results (census, losses) are printed as each leg
completes so a kill still leaves the core record in the tail; and an
env-tunable budget (VAW_DRYRUN_BUDGET_S, default 420 s) skips the optional
numerical-equality legs rather than letting the whole run be killed. Core
legs (dp+tp, dp+tp+fsdp censuses + loss equality) always run.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from ..core.diffusion import GaussianDiffusion
from ..core.schedules import get_named_beta_schedule, make_schedule
from ..core.types import LossType, ModelMeanType, ModelVarType
from ..models.dit import DiT
from ..parallel.mesh import make_mesh, shard_batch
from ..utils.config import TrainConfig
from .trainer import Trainer

__all__ = ["dryrun_multichip"]

_COLLECTIVES = ("all-reduce", "reduce-scatter", "all-gather",
                "collective-permute")

_T0 = None  # wall-clock origin, set by dryrun_multichip


def _elapsed() -> float:
    return time.monotonic() - _T0


@contextmanager
def _leg(name: str):
    """Per-leg telemetry: a timeout kill mid-leg leaves `start` without
    `done` in the tail, naming the culprit (MULTICHIP_r04 could not)."""
    print(f"[leg] {name} start t+{_elapsed():.0f}s", flush=True)
    t = time.monotonic()
    yield
    print(f"[leg] {name} done {time.monotonic() - t:.0f}s", flush=True)


def _collective_census(compiled) -> dict:
    """Count collective ops in compiled (post-SPMD-partitioner) HLO — the
    proof that the sharding annotations actually materialized as
    communication, not silent replication."""
    txt = compiled.as_text()
    # Count each collective exactly once: the sync form "all-reduce(" and
    # the async form "all-reduce-start(" (the matching "-done(" is the same
    # op). A bare substring match (" all-reduce") would count a sync op
    # twice and conflate start/done pairs.
    return {op: txt.count(f"{op}(") + txt.count(f"{op}-start(")
            for op in _COLLECTIVES}


def dryrun_multichip(n_devices: int) -> None:
    """Build an n-device ('data','model') mesh, jit the full training step
    (q_sample -> weighting -> DiT fwd/bwd -> AdamW -> EMA) with real dp+tp
    shardings, and execute ONE step on tiny shapes. Then validate the pp
    (GPipe fill-drain) and sp (ring attention) train steps numerically
    against one shared plain-dp baseline."""
    global _T0
    _T0 = time.monotonic()
    budget = float(os.environ.get("VAW_DRYRUN_BUDGET_S", "420"))

    # Always run on the CPU backend: the dryrun validates SPMD logic on
    # virtual devices and must never touch a real chip (a wedged libtpu
    # would otherwise kill it). __graft_entry__ pins jax_platforms=cpu
    # before backend init; this is the in-library guarantee.
    devices = jax.devices("cpu")
    devices = devices[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(devices)}"
    )
    # 2D mesh: tensor-parallel degree 2 when divisible, else pure data.
    model_axis = 2 if n_devices % 2 == 0 else 1
    dp_core = n_devices // model_axis
    mesh = make_mesh(data_axis=dp_core, model_axis=model_axis,
                     devices=devices)

    # Batch = smallest multiple of the data-axis size that is >= 8, so the
    # same code validates any device count (a hardcoded 8 broke sharding
    # for meshes with a data axis > 8 or not dividing 8).
    core_bs = dp_core * max(1, -(-8 // dp_core))
    cfg = TrainConfig(
        model="DiT-S", image_size=8, in_chans=4, patch_size=2,
        num_classes=10, class_cond=True, batch_size=core_bs,
        weight_type="lambda", mean_type="EPSILON", drop_label_prob=0.1,
        grad_accumulation=2, amp=False,
    )
    # Real DiT-S geometry (hidden 384, depth 12, heads 6 — models/dit.py
    # registry) on tiny images: the sharding/collective structure under
    # test is the flagship's, not a 2-block toy's.
    model = DiT(
        image_size=cfg.image_size, patch_size=2, in_channels=4,
        hidden_size=384, depth=12, num_heads=6, num_classes=10,
        class_dropout_prob=0.1,
    )
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    process = GaussianDiffusion(
        schedule=sched, model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.FIXED_LARGE, loss_type=LossType.MSE,
        weight_type=cfg.weight_type,
    )

    # default_device pins every uncommitted array (batch, rng keys, host
    # scalars) to CPU — without it jnp.asarray would initialize + commit to
    # the default backend, breaking hermeticity when a real chip coexists.
    with jax.default_device(devices[0]):
        batch = {
            "image": jnp.asarray(
                np.random.RandomState(0).randn(
                    cfg.batch_size, cfg.image_size, cfg.image_size, 4
                ), jnp.float32,
            ),
            "label": jnp.arange(cfg.batch_size) % 10,
        }

        losses = {}
        census = {}
        # Two sharding regimes over the same mesh: dp x tp with replicated
        # state, and dp x tp with ZeRO-3 param/opt-state sharding (fsdp).
        # These are the CORE legs — they always run.
        for label, fsdp in (("dp+tp", False), ("dp+tp+fsdp", True)):
            with _leg(label):
                run_cfg = replace(cfg, fsdp=fsdp)
                with mesh:
                    trainer = Trainer(run_cfg, model, process, mesh)
                    state = trainer.init_state(jax.random.key(0), batch)
                    sharded = shard_batch(mesh, batch)
                    # Compile first and census the lowered HLO: the step
                    # must actually contain the expected collectives, not
                    # silently replicate.
                    compiled = trainer.jitted_step.lower(
                        state, sharded, jax.random.key(0)).compile()
                    census[label] = _collective_census(compiled)
                    if n_devices > 1:
                        assert census[label]["all-reduce"] > 0, (
                            label, census[label])  # dp grad sync / tp rows
                    if fsdp and dp_core > 1:
                        # ZeRO-3 must re-gather sharded params for compute
                        # (a size-1 data axis makes fsdp a structural no-op,
                        # so the signature only exists when dp > 1).
                        assert census[label]["all-gather"] > 0, (
                            label, census[label])
                        # ... and scatter grads to shards. The CPU SPMD
                        # partitioner often lowers reduce-scatter as
                        # all-reduce + dynamic-slice, so accept either.
                        assert (census[label]["reduce-scatter"] > 0
                                or census[label]["all-reduce"] > 0), (
                            label, census[label])
                    state, metrics = trainer.step(state, sharded)
                    jax.block_until_ready(metrics["loss"])
                    loss = float(metrics["loss"])
                    assert np.isfinite(loss), (label, loss)
                    assert int(state.step) == 1
                    losses[label] = loss
                print(f"[partial] {label}: loss={loss:.4f} "
                      f"census={json.dumps(census[label])}", flush=True)
        # Both regimes compute the same math; shardings must not change it.
        assert abs(losses["dp+tp"] - losses["dp+tp+fsdp"]) < 1e-3, losses
        # The ZeRO-3 signature: fsdp adds param re-gathers over the plain
        # dp+tp program (only meaningful when the data axis actually
        # shards the params, i.e. dp > 1).
        if dp_core > 1:
            assert (census["dp+tp+fsdp"]["all-gather"]
                    > census["dp+tp"]["all-gather"]), census
        print(f"[partial] CORE OK: dp+tp/fsdp loss equality "
              f"{losses['dp+tp']:.4f} t+{_elapsed():.0f}s", flush=True)

        # ---- optional numerical-equality legs (pp, sp) ----------------- #
        # One SHARED tiny scanned model + plain-dp baseline serves both: pp
        # and sp test collective structure (fill-drain ppermute, ring
        # attention), not model size, so the model is as small as the mesh
        # divisibility allows and the plain-dp train step compiles ONCE.
        skipped = []
        if _elapsed() > budget:
            skipped += ["plain-baseline", "pp", "sp"]
            print(f"[leg] pp/sp SKIPPED: t+{_elapsed():.0f}s > budget "
                  f"{budget:.0f}s (VAW_DRYRUN_BUDGET_S)", flush=True)
            pp_loss = losses["dp+tp"]
        else:
            shared_model = DiT(
                image_size=8, patch_size=2, in_channels=4, hidden_size=32,
                depth=4, num_heads=2, num_classes=10,
                class_dropout_prob=0.0, scan_blocks=True,
            )
            # drop_label_prob=0 for the equality legs: the pipelined/sp
            # applies consume the label-dropout rng through different shard
            # structures, so any nonzero dropout would diverge by design.
            # Batch = smallest multiple of n_devices >= 8: the plain
            # baseline shards it over ALL devices, and the pp/sp meshes'
            # data axes divide n_devices, so one size fits every leg.
            sbs = n_devices * max(1, -(-8 // n_devices))
            shared_cfg = replace(
                cfg, image_size=8, batch_size=sbs, grad_accumulation=1,
                drop_label_prob=0.0, scan_blocks=True,
            )
            rs = np.random.RandomState(3)
            shared_batch = {
                "image": jnp.asarray(rs.randn(sbs, 8, 8, 4), jnp.float32),
                "label": jnp.arange(sbs) % 10,
            }
            with _leg("plain-baseline"):
                plain_loss, plain_params = _plain_step(
                    devices, shared_cfg, shared_model, process, shared_batch)
            print(f"[partial] plain-baseline: loss={plain_loss:.4f}",
                  flush=True)

            pp_loss = plain_loss
            if n_devices < 2:
                skipped += ["pp", "sp"]
                print("[leg] pp/sp SKIPPED: need >= 2 devices for the "
                      "ppermute rings", flush=True)
            elif _elapsed() > budget:
                skipped.append("pp")
                print(f"[leg] pp SKIPPED: over budget", flush=True)
            else:
                with _leg("pp"):
                    pp_loss, census["pp"] = _dryrun_dit_pipeline(
                        devices, shared_cfg, shared_model, process,
                        shared_batch, plain_loss, plain_params)
                    assert census["pp"]["collective-permute"] > 0, (
                        census["pp"])
                    losses["pp"] = pp_loss
                print(f"[partial] pp: loss={pp_loss:.4f} == plain "
                      f"census={json.dumps(census['pp'])}", flush=True)

            if "sp" in skipped:
                pass  # already skipped above (single-device)
            elif _elapsed() > budget:
                skipped.append("sp")
                print(f"[leg] sp SKIPPED: over budget", flush=True)
            else:
                with _leg("sp"):
                    sp_loss, census["sp"] = _dryrun_sp_dit(
                        devices, shared_cfg, shared_model, process,
                        shared_batch, plain_loss, plain_params)
                    assert census["sp"]["collective-permute"] > 0, (
                        census["sp"])
                    losses["sp"] = sp_loss
                print(f"[partial] sp: loss={losses['sp']:.4f} == plain "
                      f"census={json.dumps(census['sp'])}", flush=True)

    # Hermeticity check: no live buffer may have landed off-CPU.
    non_cpu = {
        d.platform
        for buf in jax.live_arrays()
        for d in buf.devices()
        if d.platform != "cpu"
    }
    assert not non_cpu, f"dryrun leaked buffers to non-CPU backends: {non_cpu}"

    print("collective census:", json.dumps(census))
    if skipped:
        print(f"skipped legs (budget {budget:.0f}s): {skipped}")
    print(f"dryrun_multichip({n_devices}): mesh="
          f"{dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"losses={losses} pp_loss={pp_loss:.4f} "
          f"total={_elapsed():.0f}s OK")


def _plain_step(devices, cfg, model, process, batch):
    """One plain-dp train step of the shared tiny model — the single
    numerical baseline both the pp and sp legs compare against (loss AND
    post-step params), compiled once instead of once per leg."""
    plain_mesh = make_mesh(data_axis=len(devices), model_axis=1,
                           devices=devices)
    plain_cfg = replace(cfg, pp_stages=1, pp_microbatches=0)
    with plain_mesh:
        tr = Trainer(plain_cfg, model, process, plain_mesh)
        state = tr.init_state(jax.random.key(0), batch)
        sharded = shard_batch(plain_mesh, batch)
        state, metrics = tr.step(state, sharded)
        jax.block_until_ready(metrics["loss"])
        return float(metrics["loss"]), jax.device_get(state.params)


def _assert_step_matches(loss, params, plain_loss, plain_params, label):
    assert abs(loss - plain_loss) < 1e-4, (label, loss, plain_loss)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4),
        params, plain_params)


def _dryrun_sp_dit(devices, cfg, model, process, batch,
                   plain_loss, plain_params) -> tuple:
    """Sequence-parallel (ring attention) DiT vs plain apply on a
    ('data','sp') mesh (parallel/sp_dit.py): forward equality, then a full
    TRAIN step (loss + gradients through the ppermute ring + AdamW) whose
    step-1 loss and post-step params must match the shared plain baseline."""
    from jax.sharding import Mesh

    from ..parallel.sp_dit import sequence_parallel_dit_apply

    grid = model.image_size // model.patch_size
    # sp degree: at most 4, at most the token-grid rows, and never more
    # than the devices at hand (a hardcoded 4 made devices[:4].reshape
    # raise for 2- and 3-device runs the old adaptive logic supported).
    sp = min(grid, 4, len(devices))
    assert sp >= 2, "sp leg needs >= 2 devices for the ppermute ring"
    dp = max(len(devices) // sp, 1)
    mesh = Mesh(np.array(devices[: dp * sp]).reshape(dp, sp),
                ("data", "sp"))
    apply_fn = sequence_parallel_dit_apply(model, mesh, batch_axis="data")

    # Forward equality on the baseline's own post-step params.
    x = batch["image"]
    t = jnp.zeros((x.shape[0],), jnp.float32)
    y = batch["label"]
    ref, _ = model.apply({"params": plain_params}, x, t, y)
    jitted = jax.jit(lambda v, x, t, y: apply_fn(v, x, t, y))
    compiled = jitted.lower({"params": plain_params}, x, t, y).compile()
    out, _ = jitted({"params": plain_params}, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    # The forward-only program must carry the ring (it is what the
    # samplers consume).
    fwd_census = _collective_census(compiled)
    assert fwd_census["collective-permute"] > 0, fwd_census

    # --- train-step leg: sp gradient path vs the shared baseline -------- #
    with mesh:
        tr = Trainer(cfg, model, process, mesh, apply_fn=apply_fn)
        state = tr.init_state(jax.random.key(0), batch)
        sharded = shard_batch(mesh, batch)
        # Census the TRAIN step's own HLO, not just the forward-only
        # compile above: if the partitioner lowered the sp apply inside
        # the step as replication, the loss/param equality asserts below
        # would pass vacuously with no gradient ring ever executing.
        rng = jax.random.fold_in(tr.base_rng, state.step)
        sp_step_census = _collective_census(
            tr.jitted_step.lower(state, sharded, rng).compile())
        assert sp_step_census["collective-permute"] > 0, (
            "sp train step compiled without a ppermute ring",
            sp_step_census)
        state, metrics = tr.step(state, sharded)
        jax.block_until_ready(metrics["loss"])
        sp_loss = float(metrics["loss"])
        _assert_step_matches(sp_loss, jax.device_get(state.params),
                             plain_loss, plain_params, "sp")
    return sp_loss, sp_step_census


def _dryrun_dit_pipeline(devices, cfg, model, process, batch,
                         plain_loss, plain_params) -> tuple:
    """Full train step with real DiT blocks pipelined over a
    ('data','stage') mesh. The step-1 loss AND the post-step params must
    equal the shared plain-dp baseline (same model/seed/batch; pipelining
    only reorders the forward, the loss is computed over the reassembled
    full batch) — this catches gradient bugs in the ppermute fill-drain,
    not just non-finiteness."""
    from ..parallel.dit_pipeline import pipelined_dit_apply
    from ..parallel.mesh import make_pp_mesh

    stages = 4 if len(devices) >= 4 else 2
    assert model.depth % stages == 0, (model.depth, stages)
    mesh = make_pp_mesh(stages, devices=devices)
    run_cfg = replace(cfg, pp_stages=stages, pp_microbatches=2)
    apply_fn = pipelined_dit_apply(model, mesh, 2, batch_axis="data")
    with mesh:
        trainer = Trainer(run_cfg, model, process, mesh, apply_fn=apply_fn)
        state = trainer.init_state(jax.random.key(0), batch)
        sharded = shard_batch(mesh, batch)
        census = _collective_census(trainer.jitted_step.lower(
            state, sharded, jax.random.key(0)).compile())
        # The block stack must actually shard over 'stage'.
        block_leaf = state.params["ScanBlocks"]["DiTBlock_0"][
            "Mlp_0"]["Dense_0"]["kernel"]
        assert "stage" in jax.tree_util.tree_leaves(
            tuple(block_leaf.sharding.spec)), block_leaf.sharding
        state, metrics = trainer.step(state, sharded)
        jax.block_until_ready(metrics["loss"])
        loss = float(metrics["loss"])
        assert int(state.step) == 1
        pp_params = jax.device_get(state.params)
        _assert_step_matches(loss, pp_params, plain_loss, plain_params, "pp")

        # Forward equality against the plain apply on the SAME params.
        x = batch["image"]
        t = jnp.zeros((x.shape[0],), jnp.float32)
        y = batch["label"]
        ref, _ = model.apply({"params": pp_params}, x, t, y)
        out, _ = jax.jit(
            lambda v, x, t, y: apply_fn(v, x, t, y)
        )({"params": state.params}, x, t, y)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
    return loss, census
