"""Summarize an XProf capture: per-op-family device self-time.

The tensorboard profile plugin's converter is unusable in this
environment (protobuf codegen mismatch), but every capture also writes a
Chrome trace; this tool computes nesting-aware SELF time per XLA op on
the device lane and aggregates by op family — the reliable in-context
attribution (standalone sub-program timings mislead on TPU: large jit
parameters get default layouts and per-dispatch tunnel latency dominates
small programs; see benchmarks/learn_ablation.py).

Usage:
    python benchmarks/profile_update.py          # writes artifacts/xprof/
    python scripts/xprof_summary.py [trace_dir] [--top 20]

Takes the newest ``*.trace.json.gz`` under the dir (default
artifacts/xprof/).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_file):
    with gzip.open(trace_file) as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # Device process: the pid whose process_name mentions TPU/device.
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "device" in n.lower()}
    lanes = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    op_lanes = {k for k, n in lanes.items()
                if k[0] in dev_pids and "XLA Ops" in n}
    return [e for e in events
            if e.get("ph") == "X" and (e["pid"], e.get("tid")) in op_lanes]


def self_times(events):
    """Nesting-aware self time per op name (children subtracted).

    Stacked PER (pid, tid) lane: on multi-device traces, concurrent ops
    from different lanes are not each other's children — one global stack
    would subtract device B's time from device A's enclosing op."""
    out = collections.Counter()
    by_lane = collections.defaultdict(list)
    for e in events:
        by_lane[(e["pid"], e.get("tid"))].append(e)
    for lane_events in by_lane.values():
        stack = []
        for e in sorted(lane_events, key=lambda e: (e["ts"], -e.get("dur", 0))):
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and stack[-1][1] <= ts:
                stack.pop()
            if stack:
                out[stack[-1][2]] -= dur
            out[e["name"]] += dur
            stack.append((ts, ts + dur, e["name"]))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("trace_dir", nargs="?", default="artifacts/xprof")
    parser.add_argument("--top", type=int, default=20)
    args = parser.parse_args()

    traces = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
        recursive=True))
    if not traces:
        print(f"no *.trace.json.gz under {args.trace_dir}", file=sys.stderr)
        sys.exit(1)
    trace = traces[-1]
    print(f"trace: {trace}")

    events = load_events(trace)
    if not events:
        print("no device XLA-Ops events found", file=sys.stderr)
        sys.exit(1)
    per_op = self_times(events)

    groups, counts = collections.Counter(), collections.Counter()
    for name, dur in per_op.items():
        fam = re.sub(r"[.\d]+$", "", name)
        groups[fam] += dur
        counts[fam] += 1
    total = sum(groups.values())

    print(f"device self-time total: {total / 1e3:.2f} ms "
          f"({len(events)} op events)")
    print(f"{'ms':>9}  {'share':>6}  {'count':>6}  op family")
    for fam, dur in groups.most_common(args.top):
        print(f"{dur / 1e3:9.3f}  {100 * dur / total:5.1f}%  "
              f"{counts[fam]:6d}  {fam[:80]}")
    print("\ntop single ops:")
    for name, dur in per_op.most_common(args.top // 2):
        print(f"{dur / 1e3:9.3f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
