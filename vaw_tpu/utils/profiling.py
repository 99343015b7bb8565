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

__all__ = ["trace", "compiled_flops", "estimate_train_flops", "StepTimer",
           "summarize_xplane"]


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


def summarize_xplane(xplane_path: str, top: int = 25):
    """Aggregate a jax.profiler xplane.pb into per-category / per-op device
    time. Returns {"categories": {...}, "ops": [(name, ms), ...],
    "busy_ms": float, "span_ms": float} with times in ms summed over the
    traced window. Parsing uses TF's xplane proto when available.

    Reads the "XLA Ops" line (true per-op busy time, hlo_category/tf_op
    stats); "Async XLA Ops" durations overlap compute and are excluded.
    """
    from collections import Counter

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    result = {"categories": {}, "ops": [], "busy_ms": 0.0, "span_ms": 0.0}
    # Accumulate ACROSS planes: a multi-chip host emits one TPU plane per
    # device; overwriting per plane would report only the last chip.
    bycat: Counter = Counter()
    byop: Counter = Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        smeta = {k: v.name for k, v in plane.stat_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            events = sorted(line.events, key=lambda e: e.offset_ps)
            if not events:
                continue
            result["span_ms"] = max(result["span_ms"], (
                events[-1].offset_ps + events[-1].duration_ps
                - events[0].offset_ps
            ) / 1e9)
            merged = 0
            cur_s = cur_e = None
            for ev in events:
                s, e = ev.offset_ps, ev.offset_ps + ev.duration_ps
                if cur_e is None:
                    cur_s, cur_e = s, e
                elif s <= cur_e:
                    cur_e = max(cur_e, e)
                else:
                    merged += cur_e - cur_s
                    cur_s, cur_e = s, e
                md = plane.event_metadata[ev.metadata_id]
                cat = prov = None
                for st in list(ev.stats) + list(md.stats):
                    name = smeta.get(st.metadata_id, "")
                    val = st.str_value or smeta.get(st.ref_value, "")
                    if name == "hlo_category":
                        cat = val
                    if name == "tf_op":
                        prov = val
                bycat[cat or "?"] += ev.duration_ps / 1e9
                byop[prov or md.name] += ev.duration_ps / 1e9
            if cur_e is not None:
                merged += cur_e - cur_s
            result["busy_ms"] += merged / 1e9
    result["categories"] = dict(bycat.most_common())
    result["ops"] = byop.most_common(top)
    return result
