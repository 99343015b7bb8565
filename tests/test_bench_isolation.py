"""bench.py leg isolation: the driver's official record must degrade
per-leg, never wholesale (VERDICT r3 weak-1/weak-3).

These tests monkeypatch the leg functions — no TPU needed — and assert the
JSON contract: a flagship-only failure still records the UNet-64/EDM rows,
error rows keep vs_baseline null for the baseline-less sampler metrics,
and the one-line stdout artifact always parses.
"""

import contextlib
import io
import json
import os
import signal
import subprocess
import sys
import time

import pytest


@pytest.fixture()
def patched_bench(monkeypatch):
    import bench
    from vaw_tpu.utils import cache

    monkeypatch.setattr(bench, "_wait_for_backend", lambda *a, **k: None)
    monkeypatch.setattr(bench, "_require_backend", lambda *a, **k: None)
    monkeypatch.setattr(cache, "enable_compilation_cache", lambda: None)
    monkeypatch.setattr(bench, "bench_unet64_train", lambda: {
        "metric": "unet64_train_imgs_per_sec_chip", "value": 150.0,
        "vs_baseline": 0.566, "unit": "imgs/sec/chip"})
    monkeypatch.setattr(bench, "bench_edm_sampler", lambda g, batch=128: {
        "metric": f"edm_18step_sampler_imgs_per_sec_g{g:g}", "value": 90.0,
        "vs_baseline": None, "unit": "imgs/sec"})
    monkeypatch.setattr(bench, "bench_flagship_dit", lambda: {
        "metric": "dit_b2_latent_train_imgs_per_sec_chip", "value": 1000.0,
        "vs_baseline": 1.0, "unit": "imgs/sec/chip"})
    return bench


def _run_main(bench):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, lines  # the driver contract: ONE JSON line
    return json.loads(lines[0])


def test_all_legs_green(patched_bench):
    out = _run_main(patched_bench)
    assert out["value"] == 1000.0 and out["vs_baseline"] == 1.0
    assert [m["value"] for m in out["metrics"]] == [150.0, 90.0, 90.0]


def test_flagship_failure_keeps_other_legs(patched_bench, monkeypatch):
    def boom():
        raise ValueError("boom")

    monkeypatch.setattr(patched_bench, "bench_flagship_dit", boom)
    out = _run_main(patched_bench)
    assert out["value"] == 0.0 and "boom" in out["error"]
    assert out["vs_baseline"] == 0.0  # flagship HAS a baseline
    assert out["unit"] == "imgs/sec/chip"
    # the other three legs were still attempted and recorded
    assert [m["value"] for m in out["metrics"]] == [150.0, 90.0, 90.0]


def test_sigterm_mid_run_salvages_finished_legs():
    """A driver timeout (SIGTERM) mid-run must still emit ONE JSON line
    carrying every leg that finished (VERDICT r4 weak-6) — in a subprocess
    because the salvage handler exits the process."""
    code = r"""
import sys, time
import bench
from vaw_tpu.utils import cache
bench._wait_for_backend = lambda *a, **k: None
bench._require_backend = lambda *a, **k: None
cache.enable_compilation_cache = lambda: None
bench.bench_flagship_dit = lambda: {
    "metric": "dit_b2_latent_train_imgs_per_sec_chip", "value": 1000.0,
    "vs_baseline": 1.0, "unit": "imgs/sec/chip"}
def hang():
    print("HANGING", file=sys.stderr, flush=True)
    time.sleep(300)
bench.bench_unet64_train = hang
bench.main()
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.Popen(
        [sys.executable, "-c", code], cwd=repo, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    try:
        import select

        deadline = time.monotonic() + 60
        buf = ""
        while "HANGING" not in buf:  # flagship done, unet leg is stuck
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise AssertionError("subprocess never reached the hung leg")
            # select-gate the read: a bare readline() blocks with no
            # deadline and a wedged subprocess would hang the whole suite.
            ready, _, _ = select.select([p.stderr], [], [], remaining)
            if not ready:
                raise AssertionError("subprocess never reached the hung leg")
            chunk = os.read(p.stderr.fileno(), 4096).decode(errors="replace")
            if not chunk:
                raise AssertionError("subprocess stderr closed early")
            buf += chunk
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=30)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, lines  # still exactly ONE JSON line
    rec = json.loads(lines[0])
    assert rec["value"] == 1000.0  # the finished flagship leg survived
    assert "signal" in rec.get("partial", "")
    assert "error" not in rec


def test_hung_leg_times_out_and_later_legs_still_run(patched_bench,
                                                     monkeypatch):
    """A leg wedged inside a device readback (round-5 observed tunnel
    failure mode) must be converted to an error row by the per-leg wall
    limit instead of hanging the whole record, and the legs after it must
    still be attempted."""
    monkeypatch.setenv("VAW_BENCH_LEG_TIMEOUT_S", "0.5")

    def hang():
        time.sleep(60)

    monkeypatch.setattr(patched_bench, "bench_unet64_train", hang)
    t0 = time.monotonic()
    out = _run_main(patched_bench)
    assert time.monotonic() - t0 < 30  # did not wait out the hang
    assert out["value"] == 1000.0  # flagship unaffected
    unet = out["metrics"][0]
    assert unet["value"] == 0.0 and "wall limit" in unet["error"]
    assert unet["vs_baseline"] == 0.0  # unet HAS a baseline
    # the two sampler legs after the hung one were still attempted
    assert [m["value"] for m in out["metrics"][1:]] == [90.0, 90.0]


def test_sampler_failure_keeps_null_baseline(patched_bench, monkeypatch):
    def boom(g, batch=128):
        raise ValueError("boom")

    monkeypatch.setattr(patched_bench, "bench_edm_sampler", boom)
    out = _run_main(patched_bench)
    assert out["value"] == 1000.0
    assert out["metrics"][0]["value"] == 150.0  # unet leg unaffected
    for row in out["metrics"][1:]:
        # baseline-less metric: an error row must NOT invent a 0.0 ratio
        assert row["value"] == 0.0 and row["vs_baseline"] is None


def test_timed_out_leg_retries_once_and_records(patched_bench, monkeypatch):
    """Round-5 observed wedge mode: ONE leg's readback blocks while fresh
    ops (the very next legs) run fine — so a timed-out leg gets one retry,
    and a transient wedge still produces a full row."""
    monkeypatch.setenv("VAW_BENCH_LEG_TIMEOUT_S", "0.5")
    calls = {"n": 0}

    def flaky_unet():
        calls["n"] += 1
        if calls["n"] == 1:
            time.sleep(60)  # first attempt wedges
        return {"metric": "unet64_train_imgs_per_sec_chip", "value": 150.0,
                "vs_baseline": 0.566, "unit": "imgs/sec/chip"}

    monkeypatch.setattr(patched_bench, "bench_unet64_train", flaky_unet)
    out = _run_main(patched_bench)
    assert calls["n"] == 2  # retried exactly once
    assert out["metrics"][0]["value"] == 150.0  # retry's result recorded
    assert [m["value"] for m in out["metrics"][1:]] == [90.0, 90.0]


def test_retry_budget_is_run_wide(patched_bench, monkeypatch):
    """A second timed-out leg must NOT retry (budget 1 across the run) —
    a persistently dead tunnel can't stack retries past the driver
    window. Real (non-timeout) errors never retry either."""
    monkeypatch.setenv("VAW_BENCH_LEG_TIMEOUT_S", "0.5")
    unet_calls = {"n": 0}
    edm_calls = {"n": 0}

    def hung_unet():
        unet_calls["n"] += 1
        time.sleep(60)

    def hung_edm(g, batch=512):
        edm_calls["n"] += 1
        time.sleep(60)

    monkeypatch.setattr(patched_bench, "bench_unet64_train", hung_unet)
    monkeypatch.setattr(patched_bench, "bench_edm_sampler", hung_edm)
    out = _run_main(patched_bench)
    assert unet_calls["n"] == 2  # first timeout spent the run-wide budget
    assert edm_calls["n"] == 2  # two sampler legs, one attempt each
    assert all(m["value"] == 0.0 and "wall limit" in m["error"]
               for m in out["metrics"])
