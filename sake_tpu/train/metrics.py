"""Metrics, unit conversions, and a structured metric logger.

Packages the reference's scattered eval conventions:
- bootstrap-MAE with 95% CI (``sake/utils.py:81-89``) re-exported,
- unit conversions: model units -> kcal/mol (x43.364, ``md17/eval.py:79``)
  and eV -> meV (x1000, ``iso17/eval.py``),
- a line-oriented JSONL metric logger (the reference only had
  ``print(flush=True)``; this is its structured replacement).
"""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional

from sake_tpu.utils import bootstrap_mae, mae  # re-export  # noqa: F401

KCAL_PER_MOL = 43.364  # model energy units -> kcal/mol (md17/eval.py:79)
MEV_PER_EV = 1000.0  # eV -> meV (iso17/eval.py)


def format_bootstrap(original: float, low: float, high: float) -> str:
    """``mean_{low}^{high}`` — the reference's eval report format."""
    return f"{original:.6f}_{{{low:.6f}}}^{{{high:.6f}}}"


class MetricLogger:
    """Append-only JSONL metric stream with wall-clock timestamps."""

    def __init__(self, path: Optional[str] = None, stream: Optional[IO] = None):
        self._file = open(path, "a") if path else None
        self._stream = stream if stream is not None else sys.stdout
        self._t0 = time.time()
        self.records = []  # in-memory copy (programmatic consumers)

    def log(self, step: int, **metrics) -> None:
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3), **metrics}
        self.records.append(rec)
        line = json.dumps(rec)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        else:
            print(line, file=self._stream, flush=True)

    def close(self) -> None:
        if self._file:
            self._file.close()
