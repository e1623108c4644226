"""Read the driver kill window out of a bench capture (VERDICT r4 #5).

bench.py heartbeats re-print the cumulative headline JSON every ~30 s with
`elapsed_s` (monotonic seconds since process start) and `at` (wall clock),
and the SIGTERM watcher emits one final line tagged `"killed": true`. Any
capture tail therefore encodes WHEN the driver's timeout fired:

  - a `killed` line's elapsed_s IS the window (minus signal latency);
  - otherwise the last heartbeat's elapsed_s lower-bounds it (the kill
    landed within one heartbeat interval after it).

Accepts either a driver artifact (`BENCH_rN.json` with a `tail` field), a
raw bench log, or `-` for stdin. Prints one JSON summary line.

Usage: python tools/bench_window_report.py BENCH_r05.json
"""
from __future__ import annotations

import json
import sys


def extract_json_lines(text: str) -> list:
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                out.append(json.loads(line))
            except ValueError:
                pass
    return out


def report(text: str) -> dict:
    lines = extract_json_lines(text)
    beats = [l for l in lines if "elapsed_s" in l]
    killed = [l for l in lines if l.get("killed")]
    headlines = [l for l in lines if l.get("value") is not None]
    out = {
        "json_lines": len(lines),
        "heartbeats": sum(1 for l in beats if l.get("heartbeat")),
        "last_headline_value": headlines[-1].get("value") if headlines else None,
        "last_headline_metric": (headlines[-1].get("metric")
                                 if headlines else None),
    }
    if killed:
        out["kill_window_s"] = killed[-1]["elapsed_s"]
        out["killed_at"] = killed[-1].get("at")
        out["window_source"] = "sigterm watcher (exact)"
    elif beats:
        out["kill_window_s"] = beats[-1]["elapsed_s"]
        out["window_source"] = ("last heartbeat (lower bound; kill landed "
                                "within one interval after)")
    else:
        out["window_source"] = "no timestamped lines in capture"
    return out


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "-"
    text = sys.stdin.read() if src == "-" else open(src).read()
    try:
        artifact = json.loads(text)
        if isinstance(artifact, dict) and "tail" in artifact:
            text = artifact["tail"]
    except ValueError:
        pass  # raw log
    print(json.dumps(report(text)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
