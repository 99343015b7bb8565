"""Classifier-guidance CPU e2e evidence (VERDICT r4 next-6): the full
reference workflow — train a class-conditional pixel UNet through the real
CLI, train an EncoderUNet noisy classifier (the reference ships pretrained
ones; ADM trains them with scripts/classifier_train.py — here a short optax
loop on q_sample-noised Shapes), then drive sample.py with
--use_classifier/--guidance_scale and score the guided vs unguided samples
(classifier agreement with the requested class + pixel FID proxy).

A tiny UNet variant is registered under 'UNet-32' exactly like
tests/test_classifier_cli.py does — the registry's real UNet-32 (128ch) is
CPU-infeasible; the capability under test is the guided-sampling path, not
model capacity.

Usage: python probes/_round5_classifier_e2e.py <outdir>   (~1 h, 1 core)
"""

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

TRAIN_STEPS = int(os.environ.get("CLF_E2E_TRAIN_STEPS", "400"))
CLF_STEPS = int(os.environ.get("CLF_E2E_CLF_STEPS", "300"))
N_SAMPLES = int(os.environ.get("CLF_E2E_N_SAMPLES", "64"))
SAMPLE_STEPS = int(os.environ.get("CLF_E2E_SAMPLE_STEPS", "50"))
IMG = 16


def main(out: str) -> None:
    os.environ.setdefault("VAW_PLATFORM", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from vaw_tpu.cli.main import init, parse_args, train
    from vaw_tpu.cli.sample import main as sample_main
    from vaw_tpu.models.unet import UNet_models, create_unet_model
    from vaw_tpu.samplers.classifier import (
        make_classifier_model, save_classifier_checkpoint,
    )
    from vaw_tpu.core import (
        GaussianDiffusion, ModelMeanType, get_named_beta_schedule,
        make_schedule,
    )
    from vaw_tpu.data.datasets import ShapesDataset

    def tiny_unet(num_classes=10, in_channels=3, dropout=0,
                  learn_sigma=False, class_cond=True, drop_label_prob=0.0,
                  **kwargs):
        return create_unet_model(
            image_size=IMG, num_channels=32, num_res_blocks=1,
            attention_resolutions="8", num_head_channels=16,
            channel_mult="1,2,2", num_classes=num_classes, dropout=dropout,
            in_channels=in_channels, drop_label_prob=drop_label_prob,
            learn_sigma=learn_sigma, class_cond=class_cond, **kwargs)

    UNet_models["UNet-32"] = tiny_unet

    # ---- 1. train the conditional diffusion UNet through the CLI ------ #
    logdir = os.path.join(out, "unet_train")
    cfg = parse_args([
        "--dataset", "Shapes", "--model", "UNet-32",
        "--image_size", str(IMG), "--in_chans", "3", "--num_classes", "10",
        "--class_cond", "True", "--batch_size", "32",
        "--total_steps", str(TRAIN_STEPS), "--warmup_steps", "50",
        "--lr", "3e-4", "--sample_freq", str(max(TRAIN_STEPS // 2, 1)),
        "--sample_steps", str(SAMPLE_STEPS),
        "--diffusion_steps", "1000", "--save_step", str(TRAIN_STEPS),
        "--eval", "False", "--amp", "False", "--solver", "ddim",
        "--logdir", logdir, "--weight_type", "lambda",
        "--mean_type", "EPSILON", "--sample_size", str(N_SAMPLES),
        "--num_samples", str(N_SAMPLES), "--drop_label_prob", "0.0",
        # sample.py loads EMA params; at the default 0.9999 a 400-step
        # run's EMA is ~96% random init (round-5 on-chip lesson) — 0.99
        # makes the checkpoint's EMA track the trained model.
        "--ema_decay", "0.99",
    ])
    t0 = time.time()
    ctx = init(cfg)
    train(cfg, ctx)
    print(f"[clf-e2e] UNet train done in {time.time() - t0:.0f}s")
    ckpts = sorted(glob.glob(os.path.join(cfg.logdir, "*", "checkpoint", "*")
                             ) or glob.glob(
                                 os.path.join(cfg.logdir, "checkpoint", "*")))
    assert ckpts, f"no checkpoint under {cfg.logdir}"
    ckpt = ckpts[-1]

    # ---- 2. train the EncoderUNet classifier on q_sample-noised data -- #
    clf_model = make_classifier_model(cfg)
    sched = make_schedule(get_named_beta_schedule("linear", 1000))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON)
    ds = ShapesDataset(image_size=IMG, num_classes=10, seed=3, flip=False)
    params = clf_model.init({"params": jax.random.key(0)},
                            jnp.zeros((1, IMG, IMG, 3)), jnp.zeros((1,))
                            )["params"]
    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)

    @jax.jit
    def clf_step(params, opt_state, x, y, rng):
        t = proc.sample_t(jax.random.fold_in(rng, 0), x.shape[0])
        noise = jax.random.normal(jax.random.fold_in(rng, 1), x.shape)
        xt = proc.q_sample(x, t, noise)

        def loss_fn(p):
            logits = clf_model.apply({"params": p}, xt, t)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.key(11)
    t0 = time.time()
    for step in range(CLF_STEPS):
        b = ds.get_batch(np.arange(step * 64, (step + 1) * 64) % len(ds))
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = clf_step(
            params, opt_state, jnp.asarray(b["image"]),
            jnp.asarray(b["label"]), sub)
        if step % 50 == 0 or step == CLF_STEPS - 1:
            print(f"[clf-e2e] clf step {step}: xent={float(loss):.3f}",
                  flush=True)

    # held-out accuracy on lightly-noised images (t<=250, the regime that
    # dominates guided sampling's final steps)
    hb = ShapesDataset(image_size=IMG, num_classes=10, seed=9,
                       flip=False).get_batch(np.arange(512))
    ht = jnp.full((512,), 100)
    hx = proc.q_sample(jnp.asarray(hb["image"]), ht,
                       jax.random.normal(jax.random.key(5),
                                         (512, IMG, IMG, 3)))
    pred = np.argmax(np.asarray(
        clf_model.apply({"params": params}, hx, ht)), -1)
    acc = float((pred == hb["label"]).mean())
    print(f"[clf-e2e] clf train {time.time() - t0:.0f}s, "
          f"held-out acc @t=100: {acc:.3f}")
    clf_ckpt = os.path.join(out, "clf_ckpt")
    save_classifier_checkpoint(clf_ckpt, params)

    # ---- 3. sample: unguided vs classifier-guided through sample.py --- #
    base = [
        "--model", "UNet-32", "--image_size", str(IMG), "--in_chans", "3",
        "--num_classes", "10", "--class_cond", "True",
        "--sample_steps", str(SAMPLE_STEPS), "--diffusion_steps", "1000",
        "--solver", "ddim", "--num_samples", str(N_SAMPLES),
        "--sample_size", str(N_SAMPLES), "--resume", ckpt,
    ]
    runs = {
        "unguided": base + ["--save_path", os.path.join(out, "unguided")],
        "guided": base + ["--save_path", os.path.join(out, "guided"),
                          "--use_classifier", clf_ckpt,
                          "--guidance_scale", "2.0"],
    }
    report = {"clf_heldout_acc_t100": acc}
    from PIL import Image

    from _fid_proxy import pool_features
    from vaw_tpu.evals.fid import compute_statistics

    ref = ShapesDataset(image_size=IMG, seed=1, flip=False).get_batch(
        np.arange(2048))["image"]
    ref_stats = compute_statistics(pool_features(ref))
    for name, argv in runs.items():
        t0 = time.time()
        sample_main(argv)
        imgs, labels = [], []
        for png in sorted(glob.glob(
                os.path.join(out, name, "*", "*.png"))):
            labels.append(int(os.path.basename(os.path.dirname(png))))
            imgs.append(np.asarray(Image.open(png).convert("RGB"))
                        .astype(np.float32) / 127.5 - 1.0)
        imgs = np.stack(imgs)
        y = jnp.asarray(labels)
        # classifier agreement at t=0 on the generated images: does
        # guidance actually steer toward the requested class?
        logits = clf_model.apply({"params": params}, jnp.asarray(imgs),
                                 jnp.zeros((len(imgs),)))
        agree = float((np.argmax(np.asarray(logits), -1)
                       == np.asarray(y)).mean())
        fid = ref_stats.frechet_distance(
            compute_statistics(pool_features(imgs)))
        report[name] = {"n": len(imgs), "clf_agreement": round(agree, 3),
                        "fid_proxy": round(float(fid), 3),
                        "sample_s": round(time.time() - t0, 1)}
        print(f"[clf-e2e] {name}: {report[name]}", flush=True)

    with open(os.path.join(out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("[clf-e2e] report:", json.dumps(report))


if __name__ == "__main__":
    main(sys.argv[1])
