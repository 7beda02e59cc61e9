"""Metrics logger: human/CSV/JSONL/TensorBoard writers.

Parity with the OpenAI-baselines logger used throughout the reference
(`guided_diffusion/logger.py:37-249`): `logkv/logkv_mean/dumpkvs` semantics,
configured by a log directory; plus `profile` context for wall-time scopes
(`logger.profile_kv`, `:306-318`).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._sums: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)
        self._csv_path = os.path.join(logdir, "progress.csv")
        self._jsonl = open(os.path.join(logdir, "progress.jsonl"), "a")
        # resume-safe: adopt an existing file's header instead of appending
        # a second header mid-file (which would desync columns and poison
        # the header-extension rewrite)
        self._csv_keys = None
        if os.path.exists(self._csv_path):
            with open(self._csv_path) as f:
                header = f.readline().strip()
            if header:
                self._csv_keys = header.split(",")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(
                    os.path.join(logdir, "tb"))
            except Exception:
                self._tb = None

    def logkv(self, key: str, value: float):
        self._sums[key] = float(value)
        self._counts[key] = 1

    def logkv_mean(self, key: str, value: float):
        self._sums[key] += float(value)
        self._counts[key] += 1

    @contextlib.contextmanager
    def profile(self, name: str):
        t0 = time.perf_counter()
        yield
        self.logkv_mean(f"time/{name}", time.perf_counter() - t0)

    def dumpkvs(self, step: int) -> Dict[str, float]:
        kvs = {k: self._sums[k] / max(self._counts[k], 1)
               for k in sorted(self._sums)}
        self._sums.clear()
        self._counts.clear()
        row = {"step": step, **kvs}
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        if self._csv_keys is None:
            self._csv_keys = list(row)
            with open(self._csv_path, "a") as f:
                f.write(",".join(self._csv_keys) + "\n")
        elif any(k not in self._csv_keys for k in row):
            # new keys appeared (e.g. d_loss starts on the first d-step):
            # rewrite the file with the extended header, back-filling blanks
            # (baselines `CSVOutputFormat.writekvs`, guided_diffusion/
            # logger.py:136-158)
            self._csv_keys += [k for k in row if k not in self._csv_keys]
            with open(self._csv_path) as f:
                lines = f.readlines()[1:]
            with open(self._csv_path, "w") as f:
                f.write(",".join(self._csv_keys) + "\n")
                for ln in lines:
                    ln = ln.rstrip("\n")
                    n = ln.count(",") + 1
                    f.write(ln + "," * (len(self._csv_keys) - n) + "\n")
        with open(self._csv_path, "a") as f:
            f.write(",".join(str(row.get(k, "")) for k in self._csv_keys)
                    + "\n")
        if self._tb is not None:
            with self._tb.as_default():
                import tensorflow as tf
                for k, v in kvs.items():
                    tf.summary.scalar(k, v, step=step)
                self._tb.flush()
        parts = " | ".join(f"{k} {v:.4g}" for k, v in kvs.items()
                           if not k.startswith("time/"))
        print(f"[step {step}] {parts}", flush=True)
        return kvs

    def save_image_grid(self, name: str, step: int, images):
        """images: (N, 3, H, W) in [0,1] → one horizontal strip png."""
        import numpy as np
        from PIL import Image
        arr = np.asarray(images)
        strip = np.concatenate([np.moveaxis(a, 0, -1) for a in arr], axis=1)
        path = os.path.join(self.logdir, f"{name}_{step:07d}.png")
        Image.fromarray((np.clip(strip, 0, 1) * 255).astype("uint8")
                        ).save(path)
        return path
