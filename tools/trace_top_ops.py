"""Aggregate a jax.profiler trace into per-op and per-stage time totals.

VERDICT r4 #6: the stage budget (tools/stage_bench.py) accounted for only
~60% of the measured full-pipeline batch time; this tool attributes the
rest from an actual trace of the benchmarked computation:

    python bench.py --batch_pairs 16 --iters 3 --profile_dir tmp/trace
    python tools/trace_top_ops.py tmp/trace

Reads the perfetto trace (plugins/profile/*/​*.trace.json.gz) written by
jax.profiler.stop_trace and prints, per track (TPU device vs host
threads), total event time grouped by HLO op-name prefix — enough to see
which fusions/collectives/transfers the stage budget missed.  No
tensorboard_plugin_profile dependency.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(root: str) -> dict:
    cands = sorted(
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime)
    if not cands:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    with gzip.open(cands[-1], "rt") as f:
        return json.load(f)


_FUSION_RE = re.compile(r"^(?:loop_|input_|output_)?(fusion|copy|convolution"
                        r"|dot|custom-call|dynamic-slice|dynamic-update-slice"
                        r"|scatter|gather|reduce|all-reduce|convert|transpose"
                        r"|select-and-scatter|rng|iota|broadcast|concatenate"
                        r"|slice|pad|reshape|bitcast|while|infeed|outfeed)")


def classify(name: str) -> str:
    """Collapse an HLO instruction name to a coarse class."""
    m = _FUSION_RE.match(name)
    if m:
        return m.group(1)
    return name.split(".")[0][:40]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "tmp/trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    data = load_trace(root)
    events = data.get("traceEvents", [])

    # pid -> process name (device vs host)
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", str(e["pid"]))

    per_track = collections.defaultdict(
        lambda: collections.defaultdict(float))
    per_op = collections.defaultdict(
        lambda: collections.defaultdict(float))
    track_total = collections.defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        pname = pids.get(e["pid"], str(e.get("pid")))
        name = e.get("name", "?")
        per_track[pname][classify(name)] += dur
        per_op[pname][name] += dur
        track_total[pname] += dur

    for pname in sorted(track_total, key=track_total.get, reverse=True):
        total = track_total[pname]
        if total < 1.0:
            continue
        print(f"\n=== {pname}  (total event time {total:.1f} ms) ===")
        print("-- by class --")
        for cls, ms in sorted(per_track[pname].items(),
                              key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ms:10.2f} ms  {cls}")
        print("-- top individual ops --")
        for name, ms in sorted(per_op[pname].items(),
                               key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ms:10.2f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
