"""Rank-0-gated logger (capability parity with ev-NSFnet/logger.py:8-54):
level-prefixed stdout + timestamped file under logs/, with header/stage
helpers and a module-level singleton accessor."""

from __future__ import annotations

import os
import time
from typing import Optional


class SimpleLogger:
    def __init__(self, name: str = "nsfnet_tpu", rank: int = 0,
                 log_dir: str = "logs", to_file: bool = True):
        self.name = name
        self.rank = rank
        self._fh = None
        if rank == 0 and to_file:
            try:
                os.makedirs(log_dir, exist_ok=True)
                ts = time.strftime("%Y%m%d_%H%M%S")
                self._fh = open(os.path.join(log_dir, f"{name}_{ts}.log"), "a")
            except OSError:
                self._fh = None

    def _emit(self, level: str, msg: str):
        if self.rank != 0:
            return
        line = f"[{time.strftime('%H:%M:%S')}][{level}] {msg}"
        print(line, flush=True)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()

    def info(self, msg: str):
        self._emit("INFO", msg)

    def warning(self, msg: str):
        self._emit("WARN", msg)

    def error(self, msg: str):
        self._emit("ERROR", msg)

    def header(self, title: str):
        self._emit("INFO", "=" * 60)
        self._emit("INFO", f"  {title}")
        self._emit("INFO", "=" * 60)

    def stage(self, name: str, alpha: float, epochs: int, lr: float):
        self._emit("INFO", f">>> {name}: alpha_evm={alpha} epochs={epochs:,} lr={lr:.2e}")

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


_LOGGER: Optional[SimpleLogger] = None


def get_logger(name: str = "nsfnet_tpu", rank: int = 0, **kw) -> SimpleLogger:
    global _LOGGER
    if _LOGGER is None:
        _LOGGER = SimpleLogger(name, rank, **kw)
    return _LOGGER
