"""Structured metrics logging (JSONL), replacing the reference's bare
prints (training_posenet.py:88-90, eval_full.py:88-89)."""

import json
import os
import sys
import time


class MetricsLogger:
    """Appends one JSON object per event to ``path`` (and optionally stdout).

    Usage: logger.log(step=100, loss=0.12, lr=1e-4)
    """

    def __init__(self, path=None, echo=True):
        self.path = path
        self.echo = echo
        self._f = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a")

    def log(self, **kwargs):
        record = {"ts": time.time(), **{
            k: (float(v) if hasattr(v, "item") else v) for k, v in kwargs.items()
        }}
        line = json.dumps(record)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()
        if self.echo:
            print(line)
            sys.stdout.flush()

    def close(self):
        if self._f:
            self._f.close()
            self._f = None
