"""Experiment tracking (reference: utils/utils.py:319-462 `Writer`).

Multiplexes console logging, a JSONL metrics file, and (optional)
TensorBoard. The reference's comet/wandb backends need network credentials;
here the always-on backend is local JSONL (greppable, plot-friendly) and the
avg_meter/upload_meter buffering convention is preserved: scalars logged via
avg_meter accumulate and flush once per epoch.
"""
from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class AvgMeter:
    def __init__(self):
        self.sum = 0.0
        self.cnt = 0

    def update(self, val, n: int = 1):
        self.sum += float(val) * n
        self.cnt += n

    @property
    def avg(self):
        return self.sum / max(self.cnt, 1)


class Writer:
    def __init__(self, log_dir: str = "", rank: int = 0,
                 use_tensorboard: bool = False):
        self.rank = rank
        self.log_dir = log_dir
        self.meters: Dict[str, AvgMeter] = defaultdict(AvgMeter)
        self._jsonl = None
        self._tb = None
        self._wandb = None
        self._comet = None
        if rank == 0 and log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self._tb = SummaryWriter(log_dir)
                except Exception:
                    self._tb = None
            # optional experiment trackers, same env-var gates as the
            # reference Writer (utils/utils.py:319-462: comet primary,
            # USE_WB=1 wandb); import-guarded — absent packages degrade
            # to the always-on jsonl backend
            if os.environ.get("USE_WB", "0") == "1":
                try:
                    import wandb
                    self._wandb = wandb.init(
                        project=os.environ.get("WB_PROJECT", "lion_tpu"),
                        dir=log_dir, resume="allow")
                except Exception:
                    self._wandb = None
            if os.environ.get("USE_COMET", "0") == "1":
                try:
                    from comet_ml import Experiment
                    self._comet = Experiment(
                        project_name=os.environ.get("COMET_PROJECT",
                                                    "lion_tpu"))
                except Exception:
                    self._comet = None

    def add_scalar(self, tag: str, value, step: int):
        if self.rank != 0:
            return
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "time": time.time()}) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        if self._wandb is not None:
            self._wandb.log({tag: float(value)}, step=int(step))
        if self._comet is not None:
            self._comet.log_metric(tag, float(value), step=int(step))

    def add_image(self, tag: str, img, step: int):
        """Save an HWC uint8 image grid under {log_dir}/images/ and note it
        in the JSONL stream (reference writer.add_image routes to
        comet/TB; here local PNGs are the always-on backend)."""
        if self.rank != 0 or not self.log_dir:
            return
        import numpy as np
        img = np.asarray(img)
        img_dir = os.path.join(self.log_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        safe_tag = tag.replace("/", "_")
        path = os.path.join(img_dir, f"{safe_tag}_{int(step)}.png")
        try:
            from PIL import Image
            Image.fromarray(img).save(path)
        except Exception:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.imsave(path, img)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"tag": tag, "image": path, "step": int(step),
                 "time": time.time()}) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")
        if self._comet is not None:
            self._comet.log_image(path, name=tag, step=int(step))
        if self._wandb is not None:
            try:
                import wandb
                self._wandb.log({tag: wandb.Image(path)}, step=int(step))
            except Exception:
                pass
        return path

    def avg_meter(self, tag: str, value, n: int = 1):
        self.meters[tag].update(value, n)

    def upload_meter(self, step: int):
        for tag, meter in self.meters.items():
            self.add_scalar(tag, meter.avg, step)
        self.meters.clear()

    def log(self, msg: str):
        if self.rank == 0:
            print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._comet is not None:
            self._comet.end()
