"""Summarize a jax.profiler trace: per-op device time, grouped.

The per-op evidence for step-time attribution (VERDICT r3 next #2):
``python scripts/profile_train.py --trace /tmp/tr`` writes an xplane
protobuf under ``/tmp/tr/plugins/profile/<run>/*.xplane.pb``; this tool
aggregates XLA-op durations on the device planes and prints the top
offenders plus a category rollup (matmul / attention-kernel / layernorm
chain / convert / other), so "phase X is N ms" becomes "op Y is M ms".

Usage: python scripts/trace_summary.py /tmp/tr [--top 40]
"""

import argparse
import glob
import os
import re
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load_spaces(trace_dir):
    pbs = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    spaces = []
    for p in pbs:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def categorize(name):
    n = name.lower()
    if "flash" in n or "_ca_" in n or "attention" in n or "pallas" in n:
        return "attention-kernel"
    if n.startswith(("dot", "convolution")) or "dot_general" in n \
            or re.match(r".*(gemm|matmul)", n):
        return "matmul"
    if "convert" in n or "copy" in n or "transpose" in n or "bitcast" in n:
        return "convert/copy"
    if "reduce" in n or "norm" in n or "rsqrt" in n:
        return "reduce/norm"
    if "dynamic-update" in n or "dynamic_update" in n or "scatter" in n:
        return "cache-update"
    if n.startswith(("fusion", "loop_")) or "fused" in n:
        return "fusion(elementwise)"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line_filter", default="",
                    help="only lines whose name matches this substring "
                         "(e.g. 'XLA Ops')")
    args = ap.parse_args()

    per_op = defaultdict(float)      # name -> total ps
    counts = defaultdict(int)
    total_ps = 0.0
    for path, xs in load_spaces(args.trace_dir):
        for plane in xs.planes:
            # device planes only: host python/runtime lines would double
            # count
            pname = plane.name.lower()
            if not ("tpu" in pname or "gpu" in pname or "device" in pname
                    or "/device:" in pname):
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                if args.line_filter and args.line_filter.lower() \
                        not in line.name.lower():
                    continue
                # prefer the XLA-op line when present; TensorFlow-op /
                # step lines aggregate differently
                if line.name and "step" in line.name.lower():
                    continue
                for ev in line.events:
                    md = ev_meta.get(ev.metadata_id)
                    name = md.name if md else f"op{ev.metadata_id}"
                    per_op[name] += ev.duration_ps
                    counts[name] += 1
                    total_ps += ev.duration_ps

    if not per_op:
        raise SystemExit("no device events found (pass --line_filter '' "
                         "and check the trace contains device planes)")

    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"{'op':60s} {'ms':>10s} {'calls':>7s} {'%':>6s}")
    for name, ps in rows[: args.top]:
        print(f"{name[:60]:60s} {ps / 1e9:10.3f} {counts[name]:7d} "
              f"{100 * ps / total_ps:6.2f}")

    cat = defaultdict(float)
    for name, ps in per_op.items():
        cat[categorize(name)] += ps
    print("\ncategory rollup:")
    for c, ps in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"  {c:24s} {ps / 1e9:10.3f} ms  {100 * ps / total_ps:5.1f}%")
    print(f"  {'TOTAL':24s} {total_ps / 1e9:10.3f} ms")


if __name__ == "__main__":
    main()
