"""sample.py inference CLI end-to-end: train a tiny checkpoint via main.py,
then load it with the sampling entry point and dump PNGs (per-class
subdirectories when conditional — reference: sample.py:155-182)."""

import glob
import os

import pytest

from vaw_tpu.cli.main import init, parse_args, train
from vaw_tpu.cli.sample import main as sample_main


@pytest.mark.slow
def test_sample_cli_end_to_end(tmp_path):
    logdir = str(tmp_path / "train")
    cfg = parse_args([
        "--dataset", "Gaussian", "--model", "DiT-S", "--image_size", "8",
        "--patch_size", "4", "--in_chans", "3", "--num_classes", "5",
        "--class_cond", "True", "--batch_size", "8", "--total_steps", "2",
        "--sample_freq", "0", "--sample_steps", "4",
        "--diffusion_steps", "20", "--save_step", "2", "--eval", "False",
        "--amp", "False", "--solver", "ddim", "--logdir", logdir,
        "--weight_type", "lambda",
    ])
    ctx = init(cfg)
    train(cfg, ctx)
    ckpts = glob.glob(os.path.join(cfg.logdir, "checkpoint", "*"))
    assert ckpts

    out_dir = str(tmp_path / "pngs")
    sample_main([
        "--dataset", "Gaussian", "--model", "DiT-S", "--image_size", "8",
        "--patch_size", "4", "--in_chans", "3", "--num_classes", "5",
        "--class_cond", "True", "--batch_size", "8",
        "--sample_steps", "4", "--diffusion_steps", "20",
        "--solver", "ddim", "--resume", ckpts[0],
        "--num_samples", "4", "--sample_size", "4",
        "--save_path", out_dir,
    ])
    pngs = glob.glob(os.path.join(out_dir, "*", "*.png"))
    assert len(pngs) == 4, pngs
    # conditional -> per-class subdirectories named by the integer label
    for p in pngs:
        label_dir = os.path.basename(os.path.dirname(p))
        assert label_dir.isdigit() and 0 <= int(label_dir) < 5


def test_make_sampler_instance_cached_across_calls():
    """Periodic sample/eval events must REUSE one Sampler per (ema, local)
    and swap params in: the Sampler's jit cache is per-instance, so a fresh
    instance per event would re-trace the full denoising scan at every
    --sample_freq/--eval_step boundary."""
    from types import SimpleNamespace

    from vaw_tpu.cli import main as cli_main
    from vaw_tpu.utils.config import TrainConfig

    cfg = TrainConfig(class_cond=False, num_classes=0)

    class _Model:
        def apply(self, variables, x, t, **kw):  # never traced here
            raise AssertionError("not called")

    state1 = SimpleNamespace(params={"w": 1}, ema_params={"w": 2})
    state2 = SimpleNamespace(params={"w": 3}, ema_params={"w": 4})
    ctx = {"model": _Model(), "state": state1, "sample_diffusion": None,
           "vae_decode_fn": None}

    s1 = cli_main._make_sampler(cfg, ctx)
    ctx["state"] = state2
    s2 = cli_main._make_sampler(cfg, ctx)
    assert s2 is s1  # same instance -> jit cache survives
    assert s2.params is state2.ema_params  # fresh weights swapped in
    # non-EMA is a distinct cache slot with its own params
    s3 = cli_main._make_sampler(cfg, ctx, ema=False)
    assert s3 is not s1
    assert s3.params is state2.params
