"""Multi-host wiring logic, verified with monkeypatched process
index/count (no real multi-host hardware; the SPMD math itself is covered
by the virtual-mesh tests). Mirrors the reference's rank-0 gating
(tools/dist_util.py:20-27) and DistributedSampler sharding
(main.py:166-180)."""

import os

import jax
import numpy as np
import pytest

from vaw_tpu.data.datasets import BatchLoader, GaussianDataset, load_dataset
from vaw_tpu.parallel import distributed
from vaw_tpu.utils.config import TrainConfig
from vaw_tpu.utils.logging import generate_logdir


def _fake_two_process(monkeypatch, index):
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: index)
    # broadcast needs a live multi-host runtime; identity is its semantics
    import vaw_tpu.utils.logging as logging_mod

    monkeypatch.setattr(logging_mod, "_consistent_timestamp",
                        lambda: "19700101-000000")


def test_is_main_process_gating(monkeypatch):
    _fake_two_process(monkeypatch, 1)
    assert not distributed.is_main_process()
    _fake_two_process(monkeypatch, 0)
    assert distributed.is_main_process()


def test_generate_logdir_writes_artifacts_only_on_main(monkeypatch, tmp_path):
    # Every process creates the run DIRECTORY (collective Orbax writers on
    # per-host local filesystems need it to exist); only the main process
    # writes artifacts like config.yaml.
    for index, expect_files in ((1, False), (0, True)):
        _fake_two_process(monkeypatch, index)
        cfg = TrainConfig(logdir=str(tmp_path / f"p{index}"))
        logdir = generate_logdir(cfg, snapshot=False)
        assert cfg.logdir == logdir
        assert os.path.isdir(logdir)
        assert os.path.isfile(os.path.join(logdir, "config.yaml")) == (
            expect_files)


def test_logdir_identical_across_processes(monkeypatch, tmp_path):
    paths = []
    for index in (0, 1):
        _fake_two_process(monkeypatch, index)
        cfg = TrainConfig(logdir=str(tmp_path / "run"))
        paths.append(generate_logdir(cfg, snapshot=False))
    assert paths[0] == paths[1], "checkpoint writes are collective: every " \
                                 "process must agree on the logdir"


def test_batch_loader_shards_are_disjoint_and_cover():
    ds = GaussianDataset(image_size=4, channels=1, num_classes=0, length=64)
    epochs = []
    for shard in (0, 1):
        loader = BatchLoader(ds, batch_size=8, shuffle=True, seed=7,
                             num_shards=2, shard_index=shard)
        seen = []
        for batch in loader:
            seen.append(batch["image"].reshape(len(batch["image"]), -1))
        epochs.append(np.concatenate(seen))
        assert len(loader) == 4  # 64 / 2 shards / batch 8
    a = {row.tobytes() for row in epochs[0]}
    b = {row.tobytes() for row in epochs[1]}
    assert not a & b, "process shards overlap"
    assert len(a | b) == 64, "shards do not cover the epoch"


def test_load_dataset_passes_shards():
    train, _ = load_dataset("", "Gaussian", batch_size=4, image_size=4,
                            num_shards=2, shard_index=1, channels=1)
    assert train.num_shards == 2 and train.shard_index == 1


def test_init_divides_batch_across_processes(monkeypatch, tmp_path):
    _fake_two_process(monkeypatch, 0)
    from vaw_tpu.cli.main import init, parse_args

    cfg = parse_args([
        "--dataset", "Gaussian", "--model", "DiT-S", "--image_size", "8",
        "--patch_size", "4", "--in_chans", "3", "--num_classes", "0",
        "--class_cond", "False", "--batch_size", "8",
        "--diffusion_steps", "20", "--sample_steps", "4", "--eval", "False",
        "--amp", "False", "--logdir", str(tmp_path),
    ])
    ctx = init(cfg)
    assert ctx["train_loader"].batch_size == 4  # 8 global / 2 processes
    assert ctx["train_loader"].num_shards == 2

    with pytest.raises(AssertionError, match="divisible"):
        bad = parse_args([
            "--dataset", "Gaussian", "--model", "DiT-S", "--image_size",
            "8", "--patch_size", "4", "--in_chans", "3", "--num_classes",
            "0", "--class_cond", "False", "--batch_size", "7",
            "--diffusion_steps", "20", "--sample_steps", "4",
            "--eval", "False", "--amp", "False", "--logdir", str(tmp_path),
        ])
        init(bad)


def test_generate_samples_collective_on_all_processes(monkeypatch, tmp_path):
    """The jitted sampling program consumes globally-sharded EMA state, so
    a NON-main process must still run it (rank-0-only execution would
    crash/desync a real 2-host run); only the PNG/npz IO is gated."""
    from vaw_tpu.cli import main as cli_main

    sampled = {"count": 0}

    class _FakeSampler:
        def sample(self, *a, **kw):
            sampled["count"] += 1
            arr = np.zeros((4, 8, 8, 3), np.uint8)
            return arr, np.zeros((4,), np.int32)

    monkeypatch.setattr(cli_main, "_make_sampler",
                        lambda cfg, ctx, **kw: _FakeSampler())
    # real multihost_utils.process_allgather needs a live 2-host runtime;
    # simulate both hosts' shards arriving
    from vaw_tpu.parallel import distributed as dist_mod

    monkeypatch.setattr(dist_mod, "process_allgather",
                        lambda x: np.stack([x, x]))
    saved = {"grid": 0}
    monkeypatch.setattr(cli_main, "save_grid_png",
                        lambda *a, **kw: saved.__setitem__(
                            "grid", saved["grid"] + 1) or "p.png")

    cfg = TrainConfig(logdir=str(tmp_path), num_samples=4, sample_size=4,
                      image_size=8, num_classes=0)
    _fake_two_process(monkeypatch, 1)  # non-main process
    cli_main.generate_samples(cfg, 1, {}, save_grid=True)
    assert sampled["count"] == 1  # sampling RAN
    assert saved["grid"] == 0     # IO did not

    _fake_two_process(monkeypatch, 0)  # main process
    cli_main.generate_samples(cfg, 2, {}, save_grid=True)
    assert sampled["count"] == 2
    assert saved["grid"] == 1


def test_shards_equal_length_with_remainder():
    """Wrap-around padding: every process sees the same number of batches
    even when len(dataset) % num_shards != 0 (DistributedSampler
    semantics)."""
    ds = GaussianDataset(image_size=4, channels=1, length=11)
    loaders = [
        BatchLoader(ds, batch_size=2, shuffle=True, seed=0, drop_last=True,
                    num_shards=2, shard_index=i)
        for i in (0, 1)
    ]
    counts = [sum(1 for _ in iter(ld)) for ld in loaders]
    assert counts[0] == counts[1] == len(loaders[0]) == 3  # ceil(11/2)=6 -> 3


def test_slab_loader_shards_equal_batches():
    """Slab sharding must give every process the SAME batch count (only
    full slabs participate, cycle-padded) — and more shards than slabs
    must not starve any host into an empty infinite forever() loop."""
    from vaw_tpu.data.datasets import SlabShuffleLoader

    class _SlabDS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def get_slab(self, s, e):
            return {"image": np.zeros((e - s, 2), np.float32)}

    # 10000 items, slab 4096 -> 2 full slabs + partial tail; 2 shards
    counts = []
    for i in (0, 1):
        ld = SlabShuffleLoader(_SlabDS(10000), batch_size=256,
                               slab_size=4096, shuffle=True, seed=0,
                               num_shards=2, shard_index=i)
        counts.append(sum(1 for _ in iter(ld)))
        assert len(ld) == counts[-1]
    assert counts[0] == counts[1] == 16  # 4096 samples / 256

    # more shards than slabs: cycle padding keeps every shard non-empty
    for i in range(4):
        ld = SlabShuffleLoader(_SlabDS(10000), batch_size=256,
                               slab_size=4096, shuffle=True, seed=0,
                               num_shards=4, shard_index=i)
        assert sum(1 for _ in iter(ld)) == len(ld) == 16
