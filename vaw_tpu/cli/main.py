"""Train + eval driver, flag-compatible with the reference main.py
(reference: main.py:36-405).

The structure mirrors the reference: parse_args -> init (dataset, diffusion,
model, sampler, optimizer, evaluator) -> train loop with periodic
sample/save/eval -> final eval. The step loop body is one donated jitted
SPMD program (train.Trainer); sampling/eval run jitted scan loops.
"""

from __future__ import annotations

import argparse
import os
import time
import jax

# VAW_PLATFORM pins the jax backend in-process. Env vars like
# JAX_PLATFORMS=cpu are not enough when a site plugin registers an
# accelerator backend at interpreter start (same failure mode as the
# multichip dryrun, train/dryrun.py); jax.config still wins as long as no
# backend client exists yet.
if os.environ.get("VAW_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VAW_PLATFORM"])

import numpy as np

from ..core import (
    FlowMatching,
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    get_named_beta_schedule,
    make_schedule,
    respace_schedule,
    space_timesteps,
)
from ..data import load_dataset, prefetch_to_device
from ..models import build_model
from ..parallel import make_mesh
from ..samplers import Sampler
from ..train import Trainer, load_checkpoint, save_checkpoint
from ..utils import (
    add_train_args,
    config_from_args,
    generate_logdir,
    save_grid_png,
    save_metrics_to_csv,
    save_eval_npz,
)

__all__ = ["parse_args", "build_diffusion", "init", "train", "evaluate",
           "main"]

# Multi-host preemption-flag OR-reduce cadence (steps). One cross-host
# collective per step would serialize hosts and defeat async dispatch;
# preemption grace periods (tens of seconds) dwarf 25 steps of latency.
PREEMPT_POLL_STEPS = 25


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Train and evaluate guided diffusion models (TPU)"
    )
    add_train_args(parser)
    return config_from_args(parser.parse_args(argv))


def build_diffusion(cfg, use_ddim: bool = False):
    """(reference: main.py:224-256)"""
    if cfg.model_mode == "diffusion":
        betas = get_named_beta_schedule(cfg.path_type, cfg.diffusion_steps)
        base = make_schedule(betas)
        if use_ddim and cfg.sample_steps < cfg.diffusion_steps:
            sched = respace_schedule(
                base, space_timesteps(cfg.diffusion_steps,
                                      f"ddim{cfg.sample_steps}")
            )
        else:
            sched = base
        return GaussianDiffusion(
            schedule=sched,
            model_mean_type=ModelMeanType[cfg.mean_type.upper()],
            model_var_type=ModelVarType[cfg.var_type.upper()],
            loss_type=LossType[cfg.loss_type.upper()],
            rescale_timesteps=True,
            weight_type=cfg.weight_type,
            p2_k=cfg.p2_k, p2_gamma=cfg.p2_gamma, gamma=cfg.gamma,
            learn_align=cfg.learn_align, align_type=cfg.align_type,
        )
    if cfg.model_mode == "flow":
        return FlowMatching(
            model_mean_type=ModelMeanType[cfg.mean_type.upper()],
            path_type=cfg.path_type, sampler_type=cfg.sampler_type,
            weight_type=cfg.weight_type, p2_k=cfg.p2_k,
            p2_gamma=cfg.p2_gamma, gamma=cfg.gamma,
            learn_align=cfg.learn_align, align_type=cfg.align_type,
            time_dist=tuple(cfg.time_dist),
        )
    raise ValueError(f"Unsupported model_mode: {cfg.model_mode}")


def _build_evaluator(cfg):
    """TF1-graph InceptionV3 metrics stack when the frozen graph + reference
    stats exist (reference: main.py:370-384); None otherwise.

    Degradation policy: with the DEFAULT --ref_batch, a missing stats file
    or absent frozen graph downgrades to a loud warning (zero-egress
    environments can still train). A ref batch the user typed is a promise
    — any failure is then a hard error, not 400k steps of 'FID eval
    disabled' noise."""
    from ..utils.config import TrainConfig

    explicit = cfg.ref_batch != TrainConfig.ref_batch
    try:
        from ..evals import Evaluator

        if not os.path.exists(cfg.ref_batch):
            raise FileNotFoundError(
                f"--ref_batch {cfg.ref_batch} does not exist")
        evaluator = Evaluator()
        ref_acts = evaluator.read_activations(cfg.ref_batch)
        ref_stats, ref_stats_spatial = evaluator.read_statistics(
            cfg.ref_batch, ref_acts
        )
        return evaluator, ref_acts, ref_stats, ref_stats_spatial
    except Exception as e:  # noqa: BLE001 — classified just below
        if explicit:
            raise RuntimeError(
                f"--ref_batch {cfg.ref_batch!r} was given but the evaluator "
                f"failed to build: {e}. Fix the path/graph or drop the flag."
            ) from e
        print(f"[eval] evaluator unavailable ({e}); FID eval disabled")
        return None, None, None, None


def init(cfg):
    """(reference: main.py:319-391)"""
    if cfg.pp_stages > 1:
        # Pipeline parallelism: ('data','stage') mesh, DiT blocks pipelined
        # via GPipe fill-drain (parallel/dit_pipeline.py). TPU extension —
        # the reference is dp-only (SURVEY.md §2.8).
        from ..parallel import make_pp_mesh

        if cfg.model_axis != 1:
            raise ValueError("--pp_stages composes with dp, not tp")
        if cfg.sp_degree != 1:
            raise ValueError("--pp_stages and --sp_degree are exclusive")
        if not cfg.scan_blocks:
            raise ValueError("--pp_stages requires --scan_blocks")
        if not cfg.model.startswith("DiT"):
            raise ValueError(
                "--pp_stages supports the DiT family (scan-blocks layout)")
        mesh = make_pp_mesh(cfg.pp_stages)
    elif cfg.sp_degree > 1:
        # Sequence parallelism: ('data','sp') mesh, DiT attention as a
        # ppermute ring (parallel/sp_dit.py). TPU extension.
        from jax.sharding import Mesh

        if cfg.model_axis != 1:
            raise ValueError("--sp_degree composes with dp, not tp")
        if cfg.fsdp:
            raise ValueError("--sp_degree does not compose with --fsdp")
        if not cfg.model.startswith("DiT"):
            raise ValueError("--sp_degree supports the DiT family")
        devs = np.array(jax.devices())
        if len(devs) % cfg.sp_degree != 0:
            raise ValueError(
                f"{len(devs)} devices not divisible by "
                f"--sp_degree {cfg.sp_degree}")
        mesh = Mesh(devs.reshape(-1, cfg.sp_degree), ("data", "sp"))
    else:
        mesh = make_mesh(data_axis=cfg.data_axis, model_axis=cfg.model_axis)
    generate_logdir(cfg)

    # Multi-host: each process loads its disjoint shard and 1/P of the
    # global batch; prefetch assembles the global sharded array
    # (reference: DistributedSampler re-wrap, main.py:166-180).
    n_proc = jax.process_count()
    assert cfg.batch_size % n_proc == 0, (
        f"batch_size {cfg.batch_size} not divisible by "
        f"{n_proc} processes"
    )
    train_loader, val_loader = load_dataset(
        cfg.data_dir, cfg.dataset, cfg.batch_size // n_proc, cfg.image_size,
        num_workers=cfg.num_workers, seed=cfg.seed,
        num_classes=cfg.num_classes if cfg.class_cond else 0,
        channels=cfg.in_chans,
        num_shards=n_proc, shard_index=jax.process_index(),
    )

    diffusion = build_diffusion(cfg, use_ddim=False)
    sample_diffusion = build_diffusion(cfg, use_ddim=True)

    model = build_model(cfg)

    encoder_fn = None
    align_load_error = None
    if cfg.learn_align:
        try:
            from ..encoders import initialize_encoders

            encoder_fn, _family = initialize_encoders(
                cfg.enc_type, cfg.image_size
            )
        except Exception as e:  # noqa: BLE001 — validated against the
            # first batch below: the dataset may legitimately carry
            # precomputed features (Latent_Pixel), otherwise hard error
            align_load_error = e
            print(f"[align] teacher encoder unavailable ({e}); "
                  "checking the dataset for precomputed features")

    apply_fn = None
    if cfg.pp_stages > 1:
        from ..parallel import pipelined_dit_apply

        apply_fn = pipelined_dit_apply(
            model, mesh, cfg.pp_microbatches or cfg.pp_stages,
            batch_axis="data",
        )
    elif cfg.sp_degree > 1:
        from ..parallel import sequence_parallel_dit_apply

        apply_fn = sequence_parallel_dit_apply(model, mesh,
                                               batch_axis="data")
    trainer = Trainer(cfg, model, diffusion, mesh, encoder_fn=encoder_fn,
                      apply_fn=apply_fn)

    sample_batch = next(iter(train_loader))
    if (cfg.learn_align and encoder_fn is None
            and "features" not in sample_batch
            and "pixels" not in sample_batch):
        # --learn_align with no teacher AND no dataset features would
        # silently train without the align loss the user asked for.
        raise RuntimeError(
            f"--learn_align requires teacher weights for {cfg.enc_type!r} "
            f"(load failed: {align_load_error}) or a dataset with "
            "precomputed features/pixels (Latent_Pixel)."
        )
    state = trainer.init_state(jax.random.key(cfg.seed), sample_batch)

    if cfg.resume:
        state = load_checkpoint(cfg.resume, state)
        print(f"==> Resumed from {cfg.resume} at step {int(state.step)}")

    vae_decode_fn = None
    if cfg.in_chans == 4:
        try:
            from ..data.vae import load_vae_decoder

            # bf16 decode under amp: the decoder is 48-61% of the CFG
            # sampling pipeline (PERF.md) and its output is quantized to
            # uint8; bf16-vs-f32 decode differences are below the
            # quantization step (tests/test_vae.py bf16 closeness).
            vae_decode_fn = load_vae_decoder(
                cfg.vae, dtype=cfg.compute_dtype)
        except Exception as e:  # noqa: BLE001 — classified just below
            if cfg.eval:
                # FID over undecoded latents is garbage; fail before
                # burning a 400k-step run on it.
                raise RuntimeError(
                    f"latent training with --eval True needs the VAE "
                    f"decoder (sd-vae-ft-{cfg.vae}), which failed to load: "
                    f"{e}. Provide the weights or pass --eval False."
                ) from e
            print(f"[vae] decoder unavailable ({e}); "
                  "samples stay in latent space")

    # Classifier gradient guidance (reference: main.py:350, tools/sampler.py
    # :51-89). A bad --use_classifier path is a hard error, not a silent
    # downgrade to unguided sampling.
    classifier_fn = None
    if cfg.use_classifier:
        from ..samplers.classifier import build_classifier

        # Validate the flag combo at startup — the Sampler re-checks this,
        # but it is only constructed at the first sample/eval step and a
        # mid-run abort would burn everything since the last checkpoint.
        if not (cfg.model_mode == "diffusion" and cfg.solver == "ddim"):
            raise ValueError(
                "--use_classifier requires --model_mode diffusion "
                f"--solver ddim (got model_mode={cfg.model_mode!r}, "
                f"solver={cfg.solver!r})"
            )
        classifier_fn, _ = build_classifier(cfg)
        print(f"==> Classifier guidance from {cfg.use_classifier}")

    evaluator, ref_acts, ref_stats, ref_stats_spatial = (
        (None, None, None, None) if not cfg.eval else _build_evaluator(cfg)
    )

    return {
        "mesh": mesh, "trainer": trainer, "state": state,
        "train_loader": train_loader, "val_loader": val_loader,
        "diffusion": diffusion, "sample_diffusion": sample_diffusion,
        "model": model, "vae_decode_fn": vae_decode_fn,
        "classifier_fn": classifier_fn,
        "evaluator": evaluator, "ref_acts": ref_acts,
        "ref_stats": ref_stats, "ref_stats_spatial": ref_stats_spatial,
    }


def _make_sampler(cfg, ctx, ema: bool = True, local: bool = False) -> Sampler:
    model, state = ctx["model"], ctx["state"]
    params = state.ema_params if ema else state.params
    if local:
        # Host-sharded sampling feeds per-process DIVERGENT rngs into the
        # jit; that is only sound when the computation is unambiguously
        # process-local. Pull the (fully replicated, hence locally
        # addressable) EMA to host once so the jitted program runs on
        # host-local arrays with no global-mesh commitment — a future
        # collective inside the sampler then fails loudly at trace time
        # instead of silently producing corrupted "replicated" outputs.
        params = jax.device_get(params)

    # The Sampler's jit cache is per-instance, and params flow through the
    # jitted programs as ARGUMENTS (not closure constants) — so reuse ONE
    # instance per (ema, local) across periodic sample/eval events and swap
    # the params in. Rebuilding the Sampler each event would re-trace the
    # full denoising scan every --sample_freq/--eval_step boundary.
    key = ("_sampler", ema, local)
    sampler = ctx.get(key)
    if sampler is None:
        def model_fn(p, x, t, **kw):
            return model.apply({"params": p}, x, t, train=False, **kw)

        sampler = Sampler(cfg, model_fn, diffusion=ctx["sample_diffusion"],
                          vae_decode_fn=ctx["vae_decode_fn"],
                          classifier_fn=ctx.get("classifier_fn"),
                          params=params)
        ctx[key] = sampler
    sampler.params = params
    return sampler


def generate_samples(cfg, step, ctx, save_grid=False):
    """(reference: tools/utils.py:123-165)

    Multi-host: the jitted sampling program consumes the globally-sharded
    EMA state, so EVERY process must execute it (same pattern as the
    reference's all-rank sampling + rank-0 save, tools/sampler.py:232-247,
    utils.py:135-161); only the IO below is main-process-gated."""
    from ..parallel.distributed import is_main_process, process_allgather

    n = 64 if save_grid else cfg.num_samples
    # Shard the sample count across processes with disjoint rngs, then
    # allgather — the reference's per-rank sampling + all_gather
    # (tools/sampler.py:232-247). ONLY valid when the EMA params are
    # fully replicated (plain dp): with cross-host-sharded params
    # (fsdp/tp spanning hosts) the jitted program contains collectives
    # and JAX requires identical inputs on every process — per-process
    # rngs would silently corrupt the samples. Fall back to replicated
    # sampling then.
    n_proc = jax.process_count()
    state = ctx.get("state")
    replicated = state is None or all(
        getattr(leaf.sharding, "is_fully_replicated", True)
        for leaf in jax.tree_util.tree_leaves(state.ema_params)
    )
    shard_across_hosts = n_proc > 1 and replicated
    sampler = _make_sampler(cfg, ctx, local=shard_across_hosts)
    n_local = -(-n // n_proc) if shard_across_hosts else n
    rng = jax.random.key(cfg.seed + step)
    if shard_across_hosts:
        rng = jax.random.fold_in(rng, jax.process_index())
    samples, labels = sampler.sample(
        rng, n_local,
        min(cfg.sample_size, n_local), cfg.image_size, cfg.num_classes,
        progress_bar=not save_grid,
    )
    if shard_across_hosts:
        samples = np.concatenate(list(process_allgather(samples)))[:n]
        if labels is not None:
            labels = np.concatenate(list(process_allgather(labels)))[:n]
    if is_main_process():
        if save_grid:
            path = save_grid_png(cfg.logdir, step, samples)
            print(f"[sample] grid saved: {path}")
        else:
            save_eval_npz(cfg.logdir, cfg.dataset, samples, labels)
    return samples


def evaluate(cfg, step, ctx):
    """(reference: main.py:258-275, tools/utils.py:168-188)

    Sampling is collective (all processes); the Inception/metrics stack
    and CSV run on the main process only (reference: rank-0 evaluator,
    main.py:370-384)."""
    from ..parallel.distributed import is_main_process

    evaluator = ctx["evaluator"]
    # The skip decision must be HOST-UNIFORM: only the MAIN process's
    # evaluator matters (it alone computes metrics), and per-host
    # availability may differ under the degrade policy — a host skipping
    # the collective sampling below while others enter it would hang the
    # pod. Broadcast main's decision.
    run_eval = evaluator is not None
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        run_eval = bool(multihost_utils.broadcast_one_to_all(
            np.asarray(run_eval)))
    if not run_eval:
        print("[eval] skipped (no evaluator on the main process)")
        return
    arr = generate_samples(cfg, step, ctx, save_grid=False)
    if not is_main_process():
        return
    batches = [arr[i: i + cfg.sample_size]
               for i in range(0, len(arr), cfg.sample_size)]
    sample_acts = evaluator.compute_activations(batches)
    sample_stats, sample_stats_spatial = (
        evaluator.compute_statistics(x) for x in sample_acts
    )
    is_score = evaluator.compute_inception_score(sample_acts[0])
    fid = sample_stats.frechet_distance(ctx["ref_stats"])
    sfid = sample_stats_spatial.frechet_distance(ctx["ref_stats_spatial"])
    pre, rec = evaluator.compute_prec_recall(ctx["ref_acts"][0],
                                             sample_acts[0])
    print(f"Model(EMA): IS:{is_score:.2f}, FID:{fid:.2f}, sFID:{sfid:.2f}, "
          f"Pre:{pre:.2f}, Rec:{rec:.2f}")
    save_metrics_to_csv(cfg.logdir, {
        "IS (EMA)": is_score, "FID (EMA)": fid, "sFID (EMA)": sfid,
        "Pre. (EMA)": pre, "Rec. (EMA)": rec,
    }, step)


def train(cfg, ctx):
    """(reference: main.py:278-316)"""
    from tqdm import trange

    from ..parallel.distributed import is_main_process

    trainer, mesh = ctx["trainer"], ctx["mesh"]
    state = ctx["state"]
    main_proc = is_main_process()
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )
    if main_proc:
        print(f"Model params: {n_params / 1e6:.2f} M")
        print(f"Total batch size (per update step): "
              f"{cfg.batch_size * cfg.grad_accumulation}")

    start_step = int(state.step)
    # per-process slice of the global micro*accum batch
    micro = (cfg.batch_size // jax.process_count()) * max(
        1, cfg.grad_accumulation
    )
    loader = ctx["train_loader"]
    if start_step and hasattr(loader, "fast_forward"):
        # Resume determinism: replay the loader to where the interrupted
        # run left off, so the resumed batch sequence matches the
        # uninterrupted one (the reference gets this from
        # DistributedSampler.set_epoch(step), tools/trainer.py:70-71).
        consumed = start_step * micro
        # samples -> batches by integer division is only exact when every
        # loader batch is full: with drop_last=False a short final epoch
        # batch would silently desync the resumed data order.
        # getattr default False: a loader that doesn't declare its
        # tail-batch policy must NOT be optimistically fast-forwarded.
        if consumed % loader.batch_size == 0 and getattr(
                loader, "drop_last", False):
            loader.fast_forward(consumed // loader.batch_size)
        elif main_proc:
            print("[resume] step*batch not divisible by loader batch (or "
                  "drop_last=False); loader restarts at epoch 0 (data "
                  "order will differ from the uninterrupted run)")
    data_iter = prefetch_to_device(
        _rebatched(loader, micro), mesh
    )

    from ..utils import kvlogger

    # Host-side IO (metrics, sample grids, eval) is main-process-only
    # (reference: tools/dist_util.py:20-27 gating at trainer.py:64-66,
    # utils.py:94,137, main.py:374); checkpoint saves stay collective.
    if main_proc:
        kvlogger.configure(cfg.logdir, formats=("csv", "json"))
    last_dump_t = None
    last_dump_step = start_step

    async_writer = None
    if getattr(cfg, "async_checkpoint", False):
        from ..train.checkpoint import AsyncCheckpointWriter

        async_writer = AsyncCheckpointWriter()

    # Preemption safety (TPU extension; the reference has no failure
    # handling beyond manual --resume, SURVEY.md §5): SIGTERM/SIGINT set a
    # flag, the loop checkpoints at the next step boundary and exits
    # cleanly, so a preempted pod resumes from the last step instead of
    # the last --save_step multiple.
    import signal

    preempted = {"flag": False, "signum": None}

    def _request_stop(signum, frame):
        preempted["flag"] = True
        preempted["signum"] = signum

    prev_handlers = {
        s: signal.signal(s, _request_stop)
        for s in (signal.SIGTERM, signal.SIGINT)
    }

    def _stop_requested():
        """Host-uniform preemption decision: signal delivery skews across
        hosts, and a host breaking into the collective checkpoint while
        others run the next step's collectives would deadlock the pod —
        OR-reduce the flag at the boundary (single-process: just the
        flag)."""
        if jax.process_count() == 1:
            return preempted["flag"]
        from jax.experimental import multihost_utils

        return bool(multihost_utils.process_allgather(
            np.asarray(preempted["flag"])).any())

    try:
      with trange(start_step, cfg.total_steps, initial=start_step,
                  total=cfg.total_steps, dynamic_ncols=True,
                  disable=not main_proc) as pbar:
        for step in range(start_step + 1, cfg.total_steps + 1):
            batch = next(data_iter)
            state, metrics = trainer.step(state, batch)
            ctx["state"] = state
            if main_proc and (step % 50 == 0 or step == cfg.total_steps):
                # float() materializes the loss, closing the async step
                # chain — honest inter-dump timing (see bench.py).
                mse = float(metrics.get("mse", metrics["loss"]))
                pbar.set_postfix(mse=f"{mse:.4f}")
                kvlogger.logkv("step", step)
                kvlogger.logkv("loss", float(metrics["loss"]))
                kvlogger.logkv("mse", mse)
                if "grad_norm" in metrics:
                    kvlogger.logkv("grad_norm",
                                   float(metrics["grad_norm"]))
                if "align" in metrics:
                    kvlogger.logkv("align", float(metrics["align"]))
                now = time.perf_counter()
                if last_dump_t is not None:
                    rate = (step - last_dump_step) * micro / (now - last_dump_t)
                    kvlogger.logkv(
                        "imgs_per_sec_chip", rate / len(jax.devices())
                    )
                last_dump_t, last_dump_step = now, step
                kvlogger.dumpkvs()
            pbar.update(1)

            if cfg.sample_freq > 0 and step % cfg.sample_freq == 0:
                # collective on all processes; IO gated inside
                generate_samples(cfg, step, ctx, save_grid=True)
            if cfg.save_step > 0 and step % cfg.save_step == 0:
                # collective on all processes (multi-host Orbax write)
                if async_writer is not None:
                    path = async_writer.save(cfg, step, state)
                    if main_proc:
                        print(f"Checkpoint saving (async): {path}")
                else:
                    path = save_checkpoint(cfg, step, state)
                    if main_proc:
                        print(f"Checkpoint saved: {path}")
            if (cfg.eval and cfg.eval_step > 0
                    and step % cfg.eval_step == 0):
                # collective sampling on all processes; metrics gated inside
                evaluate(cfg, step, ctx)

            # Multi-host preemption polling is a blocking cross-host
            # collective; running it every step defeats async dispatch
            # run-ahead. Poll at a HOST-UNIFORM cadence (step is identical
            # on every host, so every host joins the same collectives) —
            # a few steps of signal-delivery latency is acceptable.
            # Single-process polls the local flag every step (free).
            poll = (jax.process_count() == 1
                    or step % PREEMPT_POLL_STEPS == 0
                    or step == cfg.total_steps)
            if poll and _stop_requested():
                if async_writer is not None:
                    # a same-step async write may be in flight to the same
                    # directory; finish it before the synchronous save
                    async_writer.wait()
                path = save_checkpoint(cfg, step, state)
                if main_proc:
                    print(f"[preempt] signal {preempted['signum']}: "
                          f"checkpoint saved at step {step}: {path}; "
                          "resume with --resume")
                break
    finally:
        # restore handlers even if a step raised; a handler installed from
        # C shows up as None -> reset to SIG_DFL (signal.signal(None) raises)
        for s, h in prev_handlers.items():
            signal.signal(s, h if h is not None else signal.SIG_DFL)
    if async_writer is not None:
        async_writer.wait()
        async_writer.close()
    return state


def _rebatched(loader, batch_size):
    """Regroup loader batches to the global micro*accum batch size."""
    if loader.batch_size == batch_size:
        yield from loader.forever()
        return
    buf = None
    for batch in loader.forever():
        buf = batch if buf is None else {
            k: np.concatenate([buf[k], batch[k]]) for k in batch
        }
        while len(next(iter(buf.values()))) >= batch_size:
            yield {k: v[:batch_size] for k, v in buf.items()}
            buf = {k: v[batch_size:] for k, v in buf.items()}


def main(argv=None):
    from ..utils.cache import enable_compilation_cache
    from ..parallel.distributed import setup_distributed

    enable_compilation_cache()
    # Multi-host runtime init (reference: dist_util.setup_dist, main.py:321);
    # a no-op for single-process runs.
    setup_distributed()
    cfg = parse_args(argv)
    ctx = init(cfg)
    if cfg.train:
        train(cfg, ctx)
    if cfg.eval and not cfg.train:
        assert cfg.resume, (
            "Evaluation requires a checkpoint path provided with --resume"
        )
        # collective sampling on all processes; metrics gated inside
        evaluate(cfg, int(ctx["state"].step), ctx)


if __name__ == "__main__":
    main()
