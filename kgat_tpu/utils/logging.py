"""Structured logging: JSONL metrics + stdout.

Replaces the reference's log_helper (SURVEY.md §2.1 logging row) with the
observability the new framework standardizes on (SURVEY.md §5): one JSONL
line per event — epoch losses, eval metrics, edges/s throughput — plus
human-readable stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional


class RunLogger:
    def __init__(self, log_dir: Optional[str] = None, run_name: str = "run",
                 quiet: bool = False, resume: bool = False):
        self.t0 = time.time()
        self.quiet = quiet
        self.path = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.path = os.path.join(log_dir, f"{run_name}.jsonl")
            if not resume:
                # fresh run: truncate; --resume appends so the event log
                # stays contiguous across sessions.
                with open(self.path, "w"):
                    pass

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        rec = {"event": event, "t": round(time.time() - self.t0, 3), **fields}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if not self.quiet:
            kv = " ".join(
                f"{k}={v:.5f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in fields.items())
            print(f"[{rec['t']:9.2f}s] {event}: {kv}", file=sys.stderr)
        return rec
