"""v4 robustness ablation (VERDICT r4 #1): is the capability the texture?

Round 4's capability result was demonstrated on v3 scenes whose texture
embeds a position ramp that is globally localizing by construction.  This
driver measures how the result degrades as that cue is weakened
(`ramp_weight` 0.35 -> 0.15 -> 0.0) and as interior clutter is added
(occluders -> occlusion + normals off the 6-direction axis lattice,
`data/synthetic.py::Occluder`), for each completion checkpoint, plus the
checkpoint-independent `ours_nc` ablation and the GT-oracle row (which
shows whether the scene family remains solvable at all).

Usage (real TPU):
    python tools/robustness_table.py \
        --ckpt v3=relativepose_tpu/data/pretrained/suncg.comp.npz \
        --ckpt v4=experiments/exp_comp_suncg_r5v4/params \
        --family suncg --maxIter 64 --out RESULTS.md --append
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKETS = ("0-0.1", "0.1-0.5", "0.5-1.0")
GRID = [  # (ramp_weight, n_clutter)
    (0.35, 0), (0.15, 0), (0.0, 0),
    (0.35, 4), (0.15, 4), (0.0, 4),
]


def run(tag, argv):
    from relativepose_tpu.cli import evaluate as ev
    t0 = time.time()
    s = ev.main(argv).summary()
    s["tag"] = tag
    s["wall_s"] = round(time.time() - t0, 1)
    print(f"[robustness] {tag}: {json.dumps(s)}", flush=True)
    return s


def main():
    import relativepose_tpu
    relativepose_tpu.enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", action="append", default=[],
                   help="name=path completion checkpoint rows (repeatable)")
    p.add_argument("--family", type=str, default="suncg")
    p.add_argument("--maxIter", type=int, default=64)
    p.add_argument("--num_repeat", type=int, default=1)
    p.add_argument("--batch_pairs", type=int, default=8)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--grid", type=str, default=None,
                   help="override grid: semicolon list of ramp,clutter")
    p.add_argument("--out", type=str, default="RESULTS.md")
    p.add_argument("--append", action="store_true")
    args = p.parse_args()
    grid = GRID if not args.grid else [
        (float(t.split(",")[0]), int(t.split(",")[1]))
        for t in args.grid.split(";")]

    ckpts = []
    for spec in args.ckpt:
        name, path = spec.split("=", 1)
        ckpts.append((name, path))

    rows = []
    for ramp, clut in grid:
        scene = ["--ramp_weight", str(ramp), "--n_clutter", str(clut)]
        base = ["--dataList", "synthetic", "--synthetic_family",
                args.family, "--maxIter", str(args.maxIter),
                "--num_repeat", str(args.num_repeat),
                "--batch_pairs", str(args.batch_pairs), "--rm"] + scene
        cfg_tag = f"ramp={ramp:g} clutter={clut}"
        for name, path in ckpts:
            rows.append(run(
                f"ours [{name}] {cfg_tag}",
                base + ["--comp_ckpt", path, "--ngf", str(args.ngf),
                        "--method", "ours", "--exp",
                        f"rob_{name}_{ramp:g}_{clut}"]))
        rows.append(run(f"ours_nc {cfg_tag}",
                        base + ["--method", "ours_nc", "--exp",
                                f"rob_nc_{ramp:g}_{clut}"]))
        rows.append(run(f"oracle {cfg_tag}",
                        base + ["--method", "ours", "--exp",
                                f"rob_or_{ramp:g}_{clut}"]))

    def fmt(v):
        return "-" if v is None else f"{v:.2f}"

    lines = [
        "",
        f"## {args.family}: v4 robustness ablation "
        "(is the capability the texture?)",
        "",
        f"{args.maxIter} held-out pairs/cell x {args.num_repeat} "
        "repeat(s).  `ramp` = position-ramp texture coefficient "
        "(0.35 = the v3 scenes of the round-4 tables; 0 = no globally "
        "localizing paint); `clutter` = interior occluders per room "
        "(occlusion + off-axis normals).  `blind` column = identity-pose "
        "rotation error on that scene config.",
        "",
        "| method | scenes | rot 0-0.1 | rot 0.1-0.5 | rot 0.5-1.0 | "
        "blind 0-0.1 | trans 0-0.1 |",
        "|" + "---|" * 7,
    ]
    for r in rows:
        lines.append(
            f"| {r['tag'].rsplit(' ramp', 1)[0]} "
            f"| ramp{r['tag'].rsplit(' ramp', 1)[1]} "
            f"| {fmt(r.get('rot_0-0.1'))} | {fmt(r.get('rot_0.1-0.5'))} "
            f"| {fmt(r.get('rot_0.5-1.0'))} "
            f"| {fmt(r.get('rot_blind_0-0.1'))} "
            f"| {fmt(r.get('trans_0-0.1'))} |")
    lines += ["", "Raw summaries:", "```json", json.dumps(rows, indent=2),
              "```", ""]
    mode = "a" if args.append and os.path.exists(args.out) else "w"
    with open(args.out, mode) as f:
        f.write("\n".join(lines) + "\n")
    print(f"[robustness] wrote {args.out}")


if __name__ == "__main__":
    main()
