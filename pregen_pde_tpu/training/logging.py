"""Experiment logging sinks.

The reference logs to wandb from all three stacks plus CSV dumps and a
heartbeat logger (`TrainCNO_time_L.py:210-215`, `scOT/train.py:135-138`,
`Regular/main.py:16-29`). Here: a JSONL file logger (machine-readable, no
external service), an optional wandb passthrough when the package is
installed, and the periodic heartbeat.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path


class JSONLLogger:
    """Appends one JSON object per record to <dir>/metrics.jsonl; also mirrors
    to wandb when available and enabled."""

    def __init__(self, out_dir, use_wandb: bool = False, config: dict | None = None):
        self.path = Path(out_dir)
        self.path.mkdir(parents=True, exist_ok=True)
        self.file = (self.path / "metrics.jsonl").open("a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(dir=str(self.path), config=config or {})
            except Exception:
                self._wandb = None
        if config is not None:
            (self.path / "config.json").write_text(json.dumps(config, indent=2))

    def __call__(self, record: dict):
        record = {"ts": time.time(), **record}
        self.file.write(json.dumps(record) + "\n")
        self.file.flush()
        if self._wandb is not None:
            self._wandb.log(record)

    def close(self):
        self.file.close()
        if self._wandb is not None:
            self._wandb.finish()


class Heartbeat:
    """Periodic liveness log (≡ the reference's 30-min 'all operations
    successful' heartbeat, `Regular/main.py:24-29`)."""

    def __init__(self, interval_s: float = 1800.0, name: str = "pregen_pde_tpu"):
        self.interval = interval_s
        self.last = time.time()
        self.log = logging.getLogger(name)

    def beat(self, message: str = "all operations successful"):
        now = time.time()
        if now - self.last >= self.interval:
            self.log.info(message)
            self.last = now
            return True
        return False
