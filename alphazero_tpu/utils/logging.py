"""Structured metrics logging.

The reference's observability is log-crate macros + a progress bar
(reference: src/coach.rs:208-238, 291-299; SURVEY.md §5 "no metrics
registry"). Here every coach iteration emits one structured record:
pretty-printed to the Python logger and appended as JSONL next to the
checkpoints, so learning curves (loss, win-rate, Elo, throughput) are
machine-readable.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

logger = logging.getLogger("alphazero_tpu")


class MetricsLogger:
    def __init__(self, out_dir: Optional[str] = None, filename: str = "metrics.jsonl"):
        self.path = None
        # multi-controller runs: every process computes identical records
        # (they are reductions of replicated arrays); only process 0 owns
        # the JSONL file
        import jax

        if out_dir and jax.process_index() == 0:
            os.makedirs(out_dir, exist_ok=True)
            self.path = os.path.join(out_dir, filename)

    def log(self, record: dict) -> None:
        record = dict(record)
        record.setdefault("ts", time.time())
        logger.info(
            "iter=%s %s",
            record.get("iteration", "?"),
            " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
                if k not in ("ts", "iteration")
            ),
        )
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")
