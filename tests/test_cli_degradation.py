"""Degradation policy of the train CLI (VERDICT r1 weak 6): optional
subsystems may downgrade with defaults, but anything the user explicitly
asked for fails fast instead of print-and-continue."""

import dataclasses

import pytest

from vaw_tpu.cli.main import _build_evaluator
from vaw_tpu.utils.config import TrainConfig


def test_explicit_missing_ref_batch_is_hard_error(tmp_path):
    cfg = TrainConfig(ref_batch=str(tmp_path / "typo_stats.npz"))
    with pytest.raises(RuntimeError, match="typo_stats"):
        _build_evaluator(cfg)


def test_default_missing_ref_batch_downgrades(capsys):
    cfg = TrainConfig()  # default ref_batch, absent in this environment
    assert cfg.ref_batch == TrainConfig.ref_batch
    out = _build_evaluator(cfg)
    assert out == (None, None, None, None)
    assert "FID eval disabled" in capsys.readouterr().out


def test_explicit_corrupt_ref_batch_is_hard_error(tmp_path):
    bad = tmp_path / "corrupt.npz"
    bad.write_bytes(b"not an npz")
    cfg = TrainConfig(ref_batch=str(bad))
    with pytest.raises(RuntimeError, match="corrupt"):
        _build_evaluator(cfg)
