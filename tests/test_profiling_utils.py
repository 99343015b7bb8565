"""Profiling utilities: xplane summarizer against a hand-built trace."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from vaw_tpu.utils.profiling import summarize_xplane  # noqa: E402


def _make_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    # stat metadata: 1 = hlo_category, 2 = tf_op
    plane.stat_metadata[1].id = 1
    plane.stat_metadata[1].name = "hlo_category"
    plane.stat_metadata[2].id = 2
    plane.stat_metadata[2].name = "tf_op"

    def add_event_meta(mid, name, category, tf_op):
        em = plane.event_metadata[mid]
        em.id = mid
        em.name = name
        st = em.stats.add()
        st.metadata_id = 1
        st.str_value = category
        st2 = em.stats.add()
        st2.metadata_id = 2
        st2.str_value = tf_op

    add_event_meta(1, "fusion.1", "convolution fusion", "jit(f)/dot_general")
    add_event_meta(2, "fusion.2", "loop fusion", "jit(f)/add")

    line = plane.lines.add()
    line.name = "XLA Ops"
    # two back-to-back events: 3ms conv, 1ms loop (ps units)
    e1 = line.events.add()
    e1.metadata_id = 1
    e1.offset_ps = 0
    e1.duration_ps = int(3e9)
    e2 = line.events.add()
    e2.metadata_id = 2
    e2.offset_ps = int(3e9)
    e2.duration_ps = int(1e9)

    with open(path, "wb") as f:
        f.write(xs.SerializeToString())


def test_summarize_xplane(tmp_path):
    path = str(tmp_path / "t.xplane.pb")
    _make_xspace(path)
    r = summarize_xplane(path)
    assert abs(r["busy_ms"] - 4.0) < 1e-6
    assert abs(r["span_ms"] - 4.0) < 1e-6
    assert abs(r["categories"]["convolution fusion"] - 3.0) < 1e-6
    assert abs(r["categories"]["loop fusion"] - 1.0) < 1e-6
    ops = dict(r["ops"])
    assert abs(ops["jit(f)/dot_general"] - 3.0) < 1e-6
