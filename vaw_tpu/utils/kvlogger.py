"""Structured KV metric logger with human / JSON / CSV / TensorBoard writers.

Re-design of the vendored OpenAI-baselines logger that the reference ships
but never invokes (reference: tools/logger.py:26-495 — dormant subsystem,
SURVEY.md section 2.9). Same capability surface — logkv / logkv_mean /
dumpkvs, named profiling sections (`profile_kv`, reference logger.py:294-325)
— wired as a live subsystem: the training CLI dumps per-step scalars through
it. TensorBoard events are written via TF's summary writer when TF is
importable.
"""

from __future__ import annotations

import contextlib
import csv
import datetime
import json
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional

__all__ = [
    "KVWriter", "HumanOutputFormat", "JSONOutputFormat", "CSVOutputFormat",
    "TensorBoardOutputFormat", "Logger", "configure", "get_current",
    "logkv", "logkv_mean", "dumpkvs", "profile_kv", "profile",
]


class KVWriter:
    def writekvs(self, kvs: Dict):
        raise NotImplementedError

    def close(self):
        pass


class HumanOutputFormat(KVWriter):
    def __init__(self, path_or_file):
        if isinstance(path_or_file, str):
            self.file = open(path_or_file, "a")
            self.own = True
        else:
            self.file = path_or_file
            self.own = False

    def writekvs(self, kvs):
        items = sorted(kvs.items())
        if not items:
            return
        key_w = max(len(str(k)) for k, _ in items)
        val_strs = [
            (k, f"{v:.5g}" if isinstance(v, float) else str(v))
            for k, v in items
        ]
        val_w = max(len(v) for _, v in val_strs)
        dashes = "-" * (key_w + val_w + 7)
        lines = [dashes]
        for k, v in val_strs:
            lines.append(f"| {k:<{key_w}} | {v:<{val_w}} |")
        lines.append(dashes)
        self.file.write("\n".join(lines) + "\n")
        self.file.flush()

    def close(self):
        if self.own:
            self.file.close()


class JSONOutputFormat(KVWriter):
    def __init__(self, path: str):
        self.file = open(path, "a")

    def writekvs(self, kvs):
        clean = {
            k: (float(v) if hasattr(v, "item") or isinstance(v, float)
                else v)
            for k, v in kvs.items()
        }
        self.file.write(json.dumps(clean) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class CSVOutputFormat(KVWriter):
    def __init__(self, path: str):
        self.path = path
        self.keys: List[str] = []
        # A crash mid-write can leave a partial last line with no trailing
        # newline; appending straight onto it would corrupt one record.
        # Probe and repair in BINARY mode: text-mode tell() cookies are not
        # byte offsets, and reading a single byte that lands inside a
        # multi-byte UTF-8 character raises UnicodeDecodeError — on exactly
        # the resume-after-crash path this guard protects.
        try:
            with open(path, "rb+") as fb:
                fb.seek(0, 2)
                size = fb.tell()
                if size:
                    fb.seek(-1, 2)
                    if fb.read(1) != b"\n":
                        # Inspect the partial tail (bounded scan back to
                        # the previous newline): terminate it if it is
                        # valid text, DROP it if the crash split a
                        # multi-byte UTF-8 character — an undecodable byte
                        # poisons every later text-mode read of the file
                        # (header seeding, the extend-columns rewrite).
                        # Widen the window until it contains a newline (or
                        # the whole file): a >64KB partial line, or a window
                        # boundary splitting a multi-byte character in an
                        # otherwise-valid tail, must not truncate mid-line.
                        back = min(size, 1 << 16)
                        while True:
                            fb.seek(size - back)
                            buf = fb.read(back)
                            if b"\n" in buf or back == size:
                                break
                            back = min(size, back + (1 << 16))
                        tail = buf.rsplit(b"\n", 1)[-1]
                        try:
                            tail.decode("utf-8")
                            fb.write(b"\n")
                        except UnicodeDecodeError:
                            fb.truncate(size - len(tail))
        except FileNotFoundError:
            pass
        self.file = open(path, "a+")
        # Seed keys from an existing header so appending to a resumed CSV
        # extends columns instead of rewriting the header over old rows.
        self.file.seek(0)
        first = self.file.readline().rstrip("\n")
        if first:
            self.keys = first.split(",")
        self.file.seek(0, 2)

    def writekvs(self, kvs):
        extra = [k for k in kvs if k not in self.keys]
        if extra:
            self.keys.extend(extra)
            # Rewrite with the extended header.
            self.file.seek(0)
            lines = self.file.readlines()
            self.file.seek(0)
            self.file.truncate()
            self.file.write(",".join(self.keys) + "\n")
            for line in lines[1:]:
                self.file.write(line.rstrip("\n") + "," * len(extra) + "\n")
        row = [str(kvs.get(k, "")) for k in self.keys]
        self.file.write(",".join(row) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class TensorBoardOutputFormat(KVWriter):
    def __init__(self, log_dir: str):
        import tensorflow as tf  # present in the image

        self.tf = tf
        self.writer = tf.summary.create_file_writer(log_dir)
        self.step = 0

    def writekvs(self, kvs):
        step = int(kvs.get("step", self.step))
        with self.writer.as_default():
            for k, v in kvs.items():
                if isinstance(v, (int, float)) or hasattr(v, "item"):
                    self.tf.summary.scalar(k, float(v), step=step)
        self.writer.flush()
        self.step = step + 1

    def close(self):
        self.writer.close()


def make_output_format(fmt: str, log_dir: str) -> KVWriter:
    os.makedirs(log_dir, exist_ok=True)
    if fmt == "stdout":
        import sys

        return HumanOutputFormat(sys.stdout)
    if fmt == "log":
        return HumanOutputFormat(os.path.join(log_dir, "log.txt"))
    if fmt == "json":
        return JSONOutputFormat(os.path.join(log_dir, "progress.json"))
    if fmt == "csv":
        return CSVOutputFormat(os.path.join(log_dir, "progress.csv"))
    if fmt == "tensorboard":
        return TensorBoardOutputFormat(os.path.join(log_dir, "tb"))
    raise ValueError(f"Unknown format: {fmt}")


class Logger:
    def __init__(self, log_dir: str, formats: List[str]):
        self.log_dir = log_dir
        self.writers = [make_output_format(f, log_dir) for f in formats]
        self.name2val: Dict = {}
        self.name2cnt: Dict = defaultdict(int)

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        """Running mean between dumps (reference: tools/logger.py logkv_mean)."""
        old, cnt = self.name2val.get(key, 0.0), self.name2cnt[key]
        self.name2val[key] = old * cnt / (cnt + 1) + float(val) / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        out = dict(self.name2val)
        for w in self.writers:
            w.writekvs(out)
        self.name2val.clear()
        self.name2cnt.clear()
        return out

    def close(self):
        for w in self.writers:
            w.close()


_CURRENT: Optional[Logger] = None


def configure(log_dir: str, formats=("csv", "json")) -> Logger:
    global _CURRENT
    _CURRENT = Logger(log_dir, list(formats))
    return _CURRENT


def get_current() -> Optional[Logger]:
    return _CURRENT


def logkv(key, val):
    if _CURRENT:
        _CURRENT.logkv(key, val)


def logkv_mean(key, val):
    if _CURRENT:
        _CURRENT.logkv_mean(key, val)


def dumpkvs():
    if _CURRENT:
        return _CURRENT.dumpkvs()
    return {}


@contextlib.contextmanager
def profile_kv(name: str):
    """Accumulate wall time under 'wait_{name}'
    (reference: tools/logger.py profile_kv)."""
    start = time.time()
    try:
        yield
    finally:
        if _CURRENT:
            key = f"wait_{name}"
            _CURRENT.name2val[key] = (
                _CURRENT.name2val.get(key, 0.0) + time.time() - start
            )


def profile(name: str):
    """Decorator form (reference: tools/logger.py @profile)."""

    def decorator(fn):
        def wrapped(*args, **kwargs):
            with profile_kv(name):
                return fn(*args, **kwargs)

        return wrapped

    return decorator
