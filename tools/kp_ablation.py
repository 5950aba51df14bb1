"""Keypoint-budget ablation (VERDICT r1 item 9).

The reference's SIFT keypoint sets are unbounded (hundreds to thousands
per view, RPModule/rputil.py:152-235); this repo uses a fixed detector
capacity (KeypointConfig.n_detect) for jittability.  This tool sweeps
n_detect on the synthetic oracle-completion eval and reports per-bucket
rotation error + throughput, so the capacity default is chosen by
measurement instead of guesswork.

Usage (real TPU, ~5 min per point after the first compile):
    python tools/kp_ablation.py --sweep 128 224 512 1024 --maxIter 32
Writes a markdown table to stdout and tmp/kp_ablation.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import relativepose_tpu
    relativepose_tpu.enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--sweep", type=int, nargs="+",
                   default=[128, 224, 512, 1024])
    p.add_argument("--maxIter", type=int, default=32)
    p.add_argument("--batch_pairs", type=int, default=8)
    p.add_argument("--family", type=str, default="suncg")
    p.add_argument("--method", type=str, default="ours")
    args = p.parse_args()

    from relativepose_tpu.cli import evaluate as ev

    rows = []
    for n in args.sweep:
        t0 = time.time()
        runner = ev.main([
            "--dataList", "synthetic", "--synthetic_family", args.family,
            "--method", args.method, "--maxIter", str(args.maxIter),
            "--batch_pairs", str(args.batch_pairs),
            "--n_detect", str(n), "--exp", f"kp_abl_{n}", "--rm",
        ])
        s = runner.summary()
        s["n_detect"] = n
        s["wall_s"] = round(time.time() - t0, 1)
        rows.append(s)
        print(f"[kp_ablation] n_detect={n}: {s}", flush=True)

    os.makedirs("tmp", exist_ok=True)
    with open("tmp/kp_ablation.json", "w") as f:
        json.dump(rows, f, indent=2)

    def fmt(v):
        return "-" if v is None else f"{v:.3f}"

    print("\n| n_detect | rot 0-0.1 | rot 0.1-0.5 | rot 0.5-1.0 "
          "| trans 0.5-1.0 | sec/pair |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['n_detect']} | {fmt(r.get('rot_0-0.1'))} "
              f"| {fmt(r.get('rot_0.1-0.5'))} | {fmt(r.get('rot_0.5-1.0'))} "
              f"| {fmt(r.get('trans_0.5-1.0'))} "
              f"| {fmt(r.get('sec_per_pair'))} |")


if __name__ == "__main__":
    main()
