"""Aggregate a jax profiler trace into per-op-category totals.

Usage: python scripts/analyze_trace.py <logdir-or-trace.json.gz> [--top N]

Parses the Chrome-trace JSON the jax profiler emits
(plugins/profile/<run>/*.trace.json.gz), keeps only TPU/XLA device lanes,
and sums durations grouped by a fused-op "category" (the leading op kind of
the HLO fusion name, e.g. fusion, convolution, custom-call, copy, pad).
This is how the round-2 train-step bottlenecks (pad/convert_add transposes)
were found — see BENCH_NOTES.md.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        sys.exit(f"no *.trace.json.gz under {path}")
    return hits[-1]


def categorize(name: str) -> str:
    # "fusion.123", "convolution.5", "%fusion.2 = ..." etc.
    base = name.split(".")[0].lstrip("%")
    return re.sub(r"_\d+$", "", base)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--by-name", action="store_true",
                    help="group by full op name instead of category")
    ap.add_argument("--lane", type=str, default=None,
                    help="only lanes whose process/thread name contains this")
    args = ap.parse_args()

    trace = find_trace(args.path)
    with gzip.open(trace, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # map (pid, tid) -> lane name; keep device compute lanes
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def lane_of(e):
        return (pid_names.get(e.get("pid"), "") + "/"
                + tid_names.get((e.get("pid"), e.get("tid")), ""))

    def is_device(lane: str) -> bool:
        l = lane.lower()
        if args.lane:
            return args.lane.lower() in l
        return ("tpu" in l or "/device" in l or "xla op" in l) and \
            "steps" not in l

    totals = collections.Counter()
    counts = collections.Counter()
    lanes_seen = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = lane_of(e)
        lanes_seen[lane] += 1
        if not is_device(lane):
            continue
        key = e["name"] if args.by_name else categorize(e["name"])
        totals[key] += e["dur"]
        counts[key] += 1

    if not totals:
        print("no device events matched; lanes seen:")
        for lane, n in lanes_seen.most_common(20):
            print(f"  {n:7d}  {lane}")
        return

    grand = sum(totals.values())
    print(f"trace: {trace}")
    print(f"total device-lane time: {grand / 1e3:.1f} ms "
          f"(sum over lanes; overlapping lanes double-count)")
    print(f"{'category':40s} {'ms':>10s} {'%':>6s} {'count':>8s}")
    for k, us in totals.most_common(args.top):
        print(f"{k:40s} {us / 1e3:10.1f} {100 * us / grand:6.1f} "
              f"{counts[k]:8d}")


if __name__ == "__main__":
    main()
