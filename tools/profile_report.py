"""Summarize a JAX profiler capture into a per-kernel-class device-time table.

The runners capture xplane traces when SENAS_TRACE_DIR is set (utils/misc.py
StepTimer — the reference's observability hook, experiments/search_arc.py
dur_time logging, done the TPU way). TensorBoard's profile plugin converter
is version-broken on this image, so this tool reads the xplane protobuf
directly and aggregates XLA op time by kernel class — the exact analysis
that drove the perf decisions in BASELINE.md (fusion share, layout-copy
share, conv share).

Usage:
    SENAS_TRACE_DIR=/tmp/trace python experiments/train_model.py ...
    python tools/profile_report.py /tmp/trace [--top 15]

Accepts a trace root (searches for *.xplane.pb recursively), a plugin run
dir, or a direct .xplane.pb file.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        raise SystemExit(f"no *.xplane.pb under {path}")
    if len(hits) > 1:
        # multi-host captures write one xplane per host, and repeated runs
        # stack timestamped dirs — make partial coverage visible
        print(f"note: {len(hits)} xplane files under {path}; reporting the "
              f"newest: {hits[-1]}", file=sys.stderr)
    return hits[-1]  # newest run sorts last (timestamped dirs)


def classify(name: str) -> str:
    n = name.lower()
    if n.startswith(("fusion", "loop_fusion", "input_fusion", "output_fusion")):
        return "fusion (elementwise)"
    if n.startswith(("copy", "transpose", "bitcast")):
        return "layout copy"
    if "convolution" in n or n.startswith(("conv", "cudnn")):
        return "convolution"
    # cross-device ops FIRST: 'all-reduce'/'reduce-scatter' must not fall
    # into the plain 'reduce' prefix bucket — on multi-chip traces the
    # collective row is the whole point of this report
    if n.startswith(("all-gather", "all-reduce", "all-to-all", "ppermute",
                     "collective", "reduce-scatter", "partition", "replica")):
        return "collective"
    if n.startswith("reduce"):
        return "reduce"
    if n.startswith(("dot", "gemm", "matmul")):
        return "matmul"
    if n.startswith(("dynamic", "gather", "scatter", "select-and-scatter",
                     "pad", "slice", "concatenate", "reverse")):
        return "data movement"
    if n.startswith("custom-call"):
        return "custom-call (pallas)"
    if n.startswith(("infeed", "outfeed", "send", "recv")):
        return "host transfer"
    return "other"


def report(xplane_path: str, top: int = 15) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        space.ParseFromString(f.read())

    device_planes = [p for p in space.planes
                     if "/device:" in p.name and "CPU" not in p.name] or \
                    [p for p in space.planes if "/device:" in p.name]
    cpu_fallback = False
    if not device_planes:
        # XLA:CPU emits HLO-op events on the PjRt client threadpool lines of
        # the host plane (names like "dot_general.1" bracketed by "end: ..."
        # markers) — good enough for a functional breakdown off-TPU.
        device_planes = [p for p in space.planes if p.name == "/host:CPU"]
        cpu_fallback = True
    if not device_planes:
        raise SystemExit(f"no device planes in {xplane_path} "
                         f"(planes: {[p.name for p in space.planes]})")

    for plane in device_planes:
        if cpu_fallback:
            lines = [ln for ln in plane.lines
                     if ln.name.startswith("tf_XLAPjRtCpuClient")]
        else:
            lines = [ln for ln in plane.lines if ln.name == "XLA Ops"] or plane.lines
        per_class = collections.defaultdict(lambda: [0, 0])  # ps, count
        per_op = collections.defaultdict(lambda: [0, 0])
        for ln in lines:
            for ev in ln.events:
                meta = plane.event_metadata[ev.metadata_id].name
                if cpu_fallback and (meta.startswith("end:") or "::" in meta
                                     or meta.startswith("Threadpool")):
                    continue
                base = meta.split(".")[0]
                if base.startswith("wrapped_"):
                    base = base[len("wrapped_"):]
                cls = classify(base)
                per_class[cls][0] += ev.duration_ps
                per_class[cls][1] += 1
                per_op[base][0] += ev.duration_ps
                per_op[base][1] += 1
        total_ps = sum(v[0] for v in per_class.values())
        if total_ps == 0:
            continue
        print(f"\n=== {plane.name} — {total_ps / 1e9:.3f} ms device busy ===")
        print(f"{'class':28s} {'ms':>9s} {'%':>6s} {'kernels':>8s} {'avg µs':>8s}")
        for cls, (ps, n) in sorted(per_class.items(), key=lambda kv: -kv[1][0]):
            print(f"{cls:28s} {ps / 1e9:9.3f} {100 * ps / total_ps:6.1f} "
                  f"{n:8d} {ps / n / 1e6:8.1f}")
        print(f"\ntop {top} ops by total time:")
        for op, (ps, n) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top]:
            print(f"  {ps / 1e9:9.3f} ms  x{n:<6d} {op[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="trace dir (SENAS_TRACE_DIR) or .xplane.pb")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()
    report(find_xplane(args.path), args.top)


if __name__ == "__main__":
    main()
