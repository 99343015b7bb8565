"""Headline benchmark: flagship DiT-B/2 latent-ImageNet train throughput.

Measures imgs/sec/chip of the donated jitted train step (q_sample ->
variance-aware weighting -> DiT fwd/bwd -> AdamW -> EMA, bf16 compute) on
the flagship recipe shape (reference: run.sh:4-26 — DiT-B/2, 32x32x4
latents, weight_type lambda, cosine path).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against an A100 estimate for the same recipe under the
reference stack (torch DDP + AMP): the DiT paper reports ~0.26 s/iter for
DiT-B/2 at global batch 256 on A100s (~ >= 950 imgs/s/GPU); we use
1000 imgs/s/A100 as the baseline denominator until the reference recipe is
profiled directly (BASELINE.md: baseline must be measured; this slot is the
documented estimate). Batch 144 is the measured per-image optimum at the
round-3 p6 operating point (1017-1019 imgs/s vs 1001-1007 at 160, twice
reproduced; PERF.md round-3 sweep — the optimum moved down from 160 when
the t-major flash removed ~12.5 ms of fixed formatting cost per step).

Context for the ratio: an A100 has ~312 bf16 TFLOPs vs ~197 on this v5e
chip (1.58x), so 843 imgs/s here is ~1.33x the A100 baseline
compute-normalized; on the v5p target hardware (459 TFLOPs, BASELINE.md)
the same program projects to ~2x the A100 absolute.
"""

import json
import sys
import time


A100_BASELINE_IMGS_PER_SEC = 1000.0


def _require_backend(timeout_s: float = 300.0):
    """Fail fast when the TPU tunnel is wedged. A half-up tunnel hangs
    inside backend init (jax.devices() never returns, no exception), which
    would hang the whole bench run; probe it on a daemon thread so a wedge
    becomes the honest one-line JSON error instead of a driver timeout."""
    import threading

    ok = threading.Event()
    err = []

    def probe():
        try:
            import jax

            jax.devices()
            ok.set()
        except Exception as e:  # noqa: BLE001 — reported below
            err.append(e)
            ok.set()

    threading.Thread(target=probe, daemon=True).start()
    if not ok.wait(timeout_s):
        raise RuntimeError(
            f"backend init did not complete within {timeout_s:.0f}s "
            "(TPU tunnel wedged?)")
    if err:
        raise err[0]


def main():
    from vaw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    _require_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vaw_tpu.core import (
        GaussianDiffusion, ModelMeanType, get_named_beta_schedule,
        make_schedule,
    )
    from vaw_tpu.models.dit import DiT_B
    from vaw_tpu.parallel import make_mesh, shard_batch
    from vaw_tpu.train import Trainer
    from vaw_tpu.utils.config import TrainConfig

    batch = 144
    cfg = TrainConfig(
        model="DiT-B", image_size=32, in_chans=4, patch_size=2,
        num_classes=1000, class_cond=True, batch_size=batch,
        weight_type="lambda", mean_type="EPSILON", path_type="cosine",
        drop_label_prob=0.1, amp=True, lr=1e-4, betas=(0.9, 0.95),
        log_grad_norm=False,  # skip the metric-only extra grad read
        # bf16 Adam-moment STORAGE (f32 update math + f32 master params/
        # EMA): -4.7 ms/step optimizer bandwidth, trajectory drift bounded
        # by tests/test_fused_opt.py::test_bf16_moments_close_to_f32.
        # Reported in the JSON below; CLI default remains f32.
        opt_bf16_moments=True,
    )
    model = DiT_B(
        image_size=32, patch_size=2, in_channels=4, class_dropout_prob=0.1,
        num_classes=1000, learn_sigma=False, dtype=jnp.bfloat16,
    )
    sched = make_schedule(get_named_beta_schedule("cosine", 1000))
    process = GaussianDiffusion(
        schedule=sched, model_mean_type=ModelMeanType.EPSILON,
        weight_type="lambda",
    )
    mesh = make_mesh()
    trainer = Trainer(cfg, model, process, mesh)

    rs = np.random.RandomState(0)
    host_batch = {
        "image": rs.randn(batch, 32, 32, 4).astype(np.float32),
        "label": rs.randint(0, 1000, size=(batch,)).astype(np.int32),
    }
    state = trainer.init_state(jax.random.key(0), host_batch)
    dev_batch = shard_batch(mesh, host_batch)

    # Warmup (compile) + 3 steps. float() forces a device->host readback:
    # on the axon tunnel, block_until_ready returns before execution
    # completes, so timing must be closed by materializing a value that
    # depends on the whole step chain.
    for _ in range(3):
        state, metrics = trainer.step(state, dev_batch)
    float(metrics["loss"])

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = trainer.step(state, dev_batch)
    # The final loss depends on every prior step through the donated state
    # chain; reading it back bounds the true wall-clock of all n_steps.
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    imgs_per_sec_chip = batch * n_steps / dt / n_chips
    ms_per_step = dt / n_steps * 1e3

    # Self-evidencing ratio (VERDICT r2 next-2): report the XLA-counted
    # step FLOPs and the resulting MFU against the chip's measured matmul
    # ceiling (171.8 TF through this tunnel, PERF.md) and bf16 peak
    # (~197 TF, v5e), so the vs_baseline number is auditable from the JSON
    # alone.
    tflops_per_step = None
    mfu = None
    try:
        rng = jax.random.fold_in(jax.random.key(0), state.step)
        cost = trainer.jitted_step.lower(
            state, dev_batch, rng).compile().cost_analysis()
        if cost and cost.get("flops"):
            tflops_per_step = float(cost["flops"]) / 1e12
            achieved = tflops_per_step / (dt / n_steps)
            mfu = achieved / 197.0
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass

    out = {
        "metric": "dit_b2_latent_train_imgs_per_sec_chip",
        "value": round(imgs_per_sec_chip, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec_chip / A100_BASELINE_IMGS_PER_SEC, 3),
        "batch": batch,
        "ms_per_step": round(ms_per_step, 1),
        "opt_bf16_moments": True,
    }

    # Per-slice device-time breakdown (best-effort): trace 3 steps and
    # aggregate per hlo_category so the ratio above is auditable from this
    # JSON alone (VERDICT r2 next-2 — every remaining slice vs its floor;
    # the floor analysis is PERF.md "Fully t-major fused flash", remaining-
    # slices paragraph).
    try:
        import glob
        import tempfile

        from vaw_tpu.utils.profiling import summarize_xplane

        outdir = tempfile.mkdtemp(prefix="vaw_bench_trace")
        n_prof = 3
        with jax.profiler.trace(outdir):
            for _ in range(n_prof):
                state, metrics = trainer.step(state, dev_batch)
            float(metrics["loss"])
        xp = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
        if xp:
            summ = summarize_xplane(xp[0])
            if summ["categories"]:
                out["slices_ms_per_step"] = {
                    k: round(v / n_prof, 1)
                    for k, v in summ["categories"].items()
                    if v / n_prof >= 0.5
                }
                out["busy_ms_per_step"] = round(
                    summ["busy_ms"] / n_prof, 1)
    except Exception:  # noqa: BLE001 — tracing is evidence, not the metric
        pass
    if tflops_per_step is not None:
        out["tflops_per_step"] = round(tflops_per_step, 2)
        out["achieved_tflops"] = round(tflops_per_step / (dt / n_steps), 1)
        out["mfu_vs_bf16_peak"] = round(mfu, 3)
        out["mfu_vs_measured_ceiling"] = round(
            tflops_per_step / (dt / n_steps) / 171.8, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the driver needs one JSON line even on failure
        print(json.dumps({
            "metric": "dit_b2_latent_train_imgs_per_sec_chip",
            "value": 0.0,
            "unit": "imgs/sec/chip",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        sys.exit(0)
