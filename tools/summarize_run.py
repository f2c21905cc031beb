"""Extract a compact, committable evidence trail from a run's JSONL log.

Since round 4 the run JSONLs themselves are git-tracked (the r3 evidence
losses — see BASELINE.md "Evidence policy"), so this is now a REPORTING
aid rather than the only evidence trail: it keeps the eval events (plus
the start/resume/done markers and an epoch-timing digest) and drops the
per-epoch loss spam, compressing a multi-hour campaign to a few KB for
quoting in BASELINE.md.

Usage:
    python tools/summarize_run.py runs/amazon-r2c5.jsonl \
        > runs_evidence/amazon-r2c5.jsonl
"""

from __future__ import annotations

import json
import sys


KEEP = {"start", "resume", "eval", "done", "profile_saved"}


def summarize(lines):
    out, secs = [], []
    for ln in lines:
        ln = ln.strip()
        if not ln:
            continue
        ev = json.loads(ln)
        if ev.get("event") == "epoch":
            secs.append((ev.get("epoch"), ev.get("secs"),
                         ev.get("edges_per_s")))
        elif ev.get("event") in KEEP:
            out.append(ev)
    if secs:
        s = sorted(x[1] for x in secs if x[1] is not None)
        med = s[len(s) // 2]
        eps = sorted(x[2] for x in secs if x[2] is not None)
        out.append({"event": "epoch_digest", "n_epochs": len(secs),
                    "median_secs": med,
                    "median_edges_per_s": eps[len(eps) // 2],
                    "last_epoch": secs[-1][0]})
    return out


def main(argv):
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    with open(argv[1]) as f:
        for ev in summarize(f):
            print(json.dumps(ev))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
