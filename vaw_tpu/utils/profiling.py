"""Profiling and FLOP accounting.

TPU equivalents of the reference's vestigial telemetry (SURVEY.md section 5):
thop-style attention FLOP hooks (reference: models/unet.py:309-326) become
XLA cost analysis of the compiled program; tqdm-only timing becomes
`jax.profiler` traces plus an imgs/sec/chip StepTimer whose readings are
closed by device readback (the tunneled TPU backend returns early from
block_until_ready — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax

__all__ = ["trace", "compiled_flops", "estimate_train_flops", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a TensorBoard-viewable device trace
    (jax.profiler; replaces the reference's absent profiler integration)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_flops(fn: Callable, *args, **kwargs) -> Optional[float]:
    """FLOPs of the compiled XLA program for fn(*args) (per invocation),
    from the compiler's own cost model."""
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        return None


def estimate_train_flops(n_params: int, tokens_per_img: int) -> float:
    """Analytic fallback: fwd 2*P*T, train ~3x fwd (the standard transformer
    accounting; replaces count_flops_attn, reference models/unet.py:309-326).
    """
    return 6.0 * n_params * tokens_per_img


class StepTimer:
    """imgs/sec (/chip) over a sliding window; `lap` must be called with a
    scalar whose materialization closes the step chain."""

    def __init__(self, batch_size: int, window: int = 50):
        self.batch_size = batch_size
        self.window = window
        self.count = 0
        self.t0 = None
        self.last_rate = 0.0

    def lap(self, readback_scalar=None) -> Optional[Dict[str, float]]:
        self.count += 1
        if self.t0 is None:
            self.t0 = time.perf_counter()
            self.count = 0
            return None
        if self.count >= self.window:
            if readback_scalar is not None:
                float(readback_scalar)  # close the async chain
            dt = time.perf_counter() - self.t0
            n_chips = len(jax.devices())
            rate = self.batch_size * self.count / dt
            self.last_rate = rate
            self.t0 = time.perf_counter()
            self.count = 0
            return {
                "imgs_per_sec": rate,
                "imgs_per_sec_chip": rate / n_chips,
                "step_ms": dt / self.window * 1000,
            }
        return None
