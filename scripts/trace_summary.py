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
    # HLO event names look like '%fusion.3878 = bf16[...]{...} fusion(
    # bf16[...] %convert.12, ...), calls=...': matching the FULL string
    # keys off OPERAND names ('%convert.12' put every consumer of a
    # convert into convert/copy). Use only the result name + the opcode
    # token that follows the result shape.
    n = name.lower()
    head = n.split(" = ", 1)[0].lstrip("%")
    m = re.search(r"}\s*([a-z0-9_-]+)\(", n)
    op = m.group(1) if m else head.rstrip("0123456789.")
    key = head + " " + op
    if ("flash" in key or "_ca_" in key or "attention" in key
            or "pallas" in key or op in ("custom-call", "closed_call")
            or head.startswith("closed_call")):
        return "attention-kernel(pallas)"
    if op in ("dot", "convolution") or "gemm" in key or "matmul" in key:
        return "matmul"
    if op in ("convert", "copy", "transpose", "bitcast") \
            or head.startswith(("convert", "copy", "transpose", "bitcast")):
        return "convert/copy"
    if op in ("reduce", "rsqrt") or "norm" in head or "reduce" in head:
        return "reduce/norm"
    if op in ("dynamic-update-slice", "scatter") \
            or "dynamic-update" in head or "scatter" in head:
        return "cache-update"
    if op == "fusion" or head.startswith(("fusion", "loop_")):
        return "fusion(incl. fused matmul)"
    if op == "while" or head.startswith("while"):
        return "while-overhead"
    return "other"


def _union_ms(intervals):
    """Total covered time (ms) of a list of (start_ps, dur_ps) intervals —
    the line's BUSY time, immune to double counting of overlapping async
    events (copy-start spans until copy-done and overlaps real compute)."""
    if not intervals:
        return 0.0
    intervals.sort()
    tot = 0
    cur_s, cur_e = intervals[0][0], intervals[0][0] + intervals[0][1]
    for s, d in intervals[1:]:
        e = s + d
        if s > cur_e:
            tot += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    tot += cur_e - cur_s
    return tot / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line_filter", default="",
                    help="only lines whose name matches this substring "
                         "(e.g. 'XLA Ops')")
    args = ap.parse_args()

    # events grouped per device line: summing across lines double counts
    # (the 'XLA Modules' line holds the whole jit_step; async-copy lines
    # overlap the compute line)
    lines = {}        # line key -> dict(per_op, counts, intervals)
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
                lname = line.name or f"line{line.id}"
                if args.line_filter and args.line_filter.lower() \
                        not in lname.lower():
                    continue
                if "step" in lname.lower():
                    continue
                rec = lines.setdefault(
                    f"{plane.name}/{lname}",
                    {"per_op": defaultdict(float),
                     "counts": defaultdict(int), "iv": [], "ev": []})
                for ev in line.events:
                    md = ev_meta.get(ev.metadata_id)
                    name = md.name if md else f"op{ev.metadata_id}"
                    rec["per_op"][name] += ev.duration_ps
                    rec["counts"][name] += 1
                    rec["iv"].append((ev.offset_ps, ev.duration_ps))
                    rec["ev"].append((ev.offset_ps, ev.duration_ps, name))

    if not lines:
        raise SystemExit("no device events found (pass --line_filter '' "
                         "and check the trace contains device planes)")

    print("device lines (busy = union of event intervals; sum > busy "
          "means overlapping/async events on that line):")
    for key, rec in sorted(lines.items(),
                           key=lambda kv: -_union_ms(kv[1]["iv"])):
        s = sum(rec["per_op"].values()) / 1e9
        print(f"  {key[:58]:58s} busy {_union_ms(rec['iv']):9.3f} ms  "
              f"sum {s:9.3f} ms")

    # primary analysis: the XLA Ops line (per-op compute); fall back to
    # the busiest line
    def pick(keys):
        for k in keys:
            if "xla ops" in k.lower():
                return k
        return max(keys, key=lambda k: _union_ms(lines[k]["iv"]))

    key = pick(list(lines))
    rec = lines[key]
    counts = rec["counts"]

    # EXCLUSIVE (self) time: scan bodies (%while) and calls nest their
    # inner ops on the same line; inclusive sums double count them. Sweep
    # events sorted by (start, -dur) with a containment stack and charge
    # each op its duration minus its direct children's.
    evs = sorted(rec["ev"], key=lambda e: (e[0], -e[1]))
    per_op = defaultdict(float)     # name -> exclusive ps
    stack = []                      # (end_ps, name) containment stack
    for off, dur, name in evs:
        while stack and off >= stack[-1][0]:
            stack.pop()
        if stack:
            per_op[stack[-1][1]] -= dur      # charge child to parent
        stack.append((off + dur, name))
        per_op[name] += dur

    total_ps = sum(max(v, 0.0) for v in per_op.values())
    print(f"\nper-op EXCLUSIVE time on '{key}' "
          f"(busy {_union_ms(rec['iv']):.3f} ms):")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"{'op':60s} {'ms':>10s} {'calls':>7s} {'%':>6s}")
    for name, ps in rows[: args.top]:
        print(f"{name[:60]:60s} {ps / 1e9:10.3f} {counts[name]:7d} "
              f"{100 * ps / total_ps:6.2f}")

    cat = defaultdict(float)
    for name, ps in per_op.items():
        # async copy-start/done pairs are MSA VMEM prefetches / collective
        # permutes that OVERLAP compute; bucket them apart so they are not
        # read as critical-path time (VERDICT r4: the 61% 'convert/copy'
        # rollup in the first round-4 trace was exactly this artifact)
        if name.startswith(("copy-start", "copy-done", "%copy-start",
                            "%copy-done")):
            cat["async-copy (overlapped)"] += ps
        else:
            cat[categorize(name)] += ps
    print("\ncategory rollup:")
    for c, ps in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"  {c:24s} {ps / 1e9:10.3f} ms  {100 * ps / total_ps:5.1f}%")
    print(f"  {'TOTAL (sum)':24s} {total_ps / 1e9:10.3f} ms")


if __name__ == "__main__":
    main()
