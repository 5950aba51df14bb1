"""Assemble the final multi-family RESULTS.md from round-5 campaign logs.

make_results.py writes one family section per invocation; this driver
merges the three family runs (which executed staggered across the round
so TPU rows and host-C++ classical rows could pipeline on one core),
the scannet --alterStep 2 row, the standalone matterport classical rows,
and the ROBUSTNESS.md ablation into a single RESULTS.md.

Inputs are the campaign logs (tmp/logs/*.log): every row prints either a
`[make_results] <tag>: {python-dict}` line or a bare JSON summary line.
"""

from __future__ import annotations

import ast
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKETS = ("0-0.1", "0.1-0.5", "0.5-1.0")


def rows_from_make_results_log(path):
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith("[make_results] ") and "{" in line:
                tag = line[len("[make_results] "):line.index(": {")]
                d = ast.literal_eval(line[line.index("{"):])
                d["tag"] = tag
                rows.append(d)
    # de-dup by tag, keep last
    out = {}
    for r in rows:
        out[r["tag"]] = r
    return list(out.values())


def summarize_npy(exp, tag, out_dir="tmp/rpe"):
    """Recompute a summary row from an exp's saved .result.npy (the
    harness's resume artifact) — robust to lost/garbled driver logs."""
    import numpy as np
    from relativepose_tpu.eval.harness import OVERLAP_BUCKETS, bucket_of
    path = os.path.join(out_dir, exp, f"{exp}.result.npy")
    if not os.path.exists(path):
        return None
    stats = {k: {b: [] for b in OVERLAP_BUCKETS}
             for k in ("rot", "trans", "rot_blind", "trans_blind",
                       "trans_id")}
    for r in np.load(path, allow_pickle=True):
        b = bucket_of(float(r["overlap"]))
        stats["rot"][b].append(float(r["err_ad"]))
        stats["trans"][b].append(float(r["err_t"]))
        for k, src in (("rot_blind", "err_blind"),
                       ("trans_blind", "err_t_blind"),
                       ("trans_id", "err_t_id")):
            if src in r:
                stats[k][b].append(float(r[src]))
    out = {"tag": tag}
    for b in OVERLAP_BUCKETS:
        for k in stats:
            v = stats[k][b]
            out[f"{k}_{b}"] = float(np.mean(v)) if v else None
    return out


def json_rows(path, tags):
    """Bare JSON summary lines, in the order the driver script ran them."""
    rows = []
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and "rot_0.1-0.5" in line:
                rows.append(json.loads(line))
    for r, t in zip(rows, tags):
        r["tag"] = t
    return rows[:len(tags)]


def fmt(v):
    return "-" if v is None else f"{v:.2f}"


def section(family, rows, max_iter, num_repeat, ckpt, extra_notes=()):
    lines = [
        f"## {family}",
        "",
        f"Protocol: `cli.evaluate` on {max_iter} synthetic {family} pano "
        f"pairs x {num_repeat} repeats (same generator + seeds for every "
        "row), per-overlap-bucket mean errors — the reference's "
        "evaluation.py protocol (evaluation.py:319-328; classical rows "
        "run 1 repeat, see note).  Rotation err_ad in degrees, "
        "translation err_t in meters.",
        "",
        f"Completion checkpoint: `{ckpt}` (SCNet trained in-repo; see "
        "docs/TRAINING.md).",
        "",
        "| method | " + " | ".join(f"rot {b}" for b in BUCKETS) + " | "
        + " | ".join(f"trans {b}" for b in BUCKETS)
        + " | sec/pair | compile s |",
        "|" + "---|" * 9,
    ]
    blind = rows[0]
    for r in rows:
        cells = [fmt(r.get(f"rot_{b}")) for b in BUCKETS]
        cells += [fmt(r.get(f"trans_{b}")) for b in BUCKETS]
        cells += [fmt(r.get("sec_per_pair")), fmt(r.get("compile_s"))]
        lines.append(f"| {r['tag']} | " + " | ".join(cells) + " |")
    lines.append("| blind (identity pose) | " + " | ".join(
        [fmt(blind.get(f"rot_blind_{b}")) for b in BUCKETS]
        + [fmt(blind.get(f"trans_id_{b}")) for b in BUCKETS]
        + ["-", "-"]) + " |")
    lines += [
        "",
        "Notes:",
        "- 'GT oracle completion' substitutes ground-truth panos for the "
        "SCNet output — the upper bound of the matching/solver stack.",
        "- 'blind' predicts the identity pose — any useful method must "
        "beat it (the reference prints err_blind per pair, evaluation.py:"
        "294-297).  Its translation columns are the true identity-pose "
        "error ||(I - R_gt)@mean_pc - t_gt||; the reference's "
        "err_t_blind=||t_hat - t_gt|| depends on the evaluated method's "
        "own prediction and is reported only in the raw JSON "
        "(trans_blind_*).",
        "- sec/pair is steady-state device time (the first, compiling "
        "batch is excluded and reported in the 'compile s' column; the "
        "reference has no compile phase).  Rows in this table ran "
        "concurrently with host-side classical baselines on a 1-core "
        "VM, so sec/pair varies with host contention; bench.py is the "
        "controlled throughput measurement.",
        "- classical methods skip pairs with overlap < 0.1 (evaluation."
        "py:190-191), so their 0-0.1 columns are empty by protocol — "
        "only the 'ours' family operates there.  Classical rows run "
        "ONE repeat: their stochasticity is internal to the C++ solvers "
        "(the harness's per-repeat keys only reseed ours-family "
        "keypoint sampling).",
        "- per-recurrence-step errors for the flagship row are in the "
        "raw JSON (rot_steps_* / trans_steps_*): the round-5 recurrence "
        "triage (VERDICT r4 #3).",
        "- cgs (colored ICP) translation columns can be absurdly large: "
        "when RANSAC hands colored ICP a bad initialization it can "
        "diverge without bound, and neither the reference "
        "(baselines.py:110-168) nor this port clamps the result; "
        "values are reported as computed.",
    ]
    lines += list(extra_notes)
    lines += ["", "Raw summaries:", "```json",
              json.dumps(rows, indent=2), "```", ""]
    return lines


def main():
    out = ["# RESULTS — learned-model accuracy (synthetic scenes, single "
           "v5e chip)", ""]

    # --- suncg ---
    su = rows_from_make_results_log("tmp/logs/matrix_suncg_r5.log")
    out += section(
        "suncg", su, 256, 3,
        "relativepose_tpu/data/pretrained/suncg.comp.npz",
        extra_notes=[
            "- 'best-step select' returns the recurrence step with the "
            "highest solver-confidence score (affinity-weighted inlier "
            "rate) instead of the reference's last step — a "
            "beyond-reference harness option (--step_select "
            "best_score); it wins both >=0.1-overlap buckets in "
            "rotation AND translation.",
            "- '+inlier refit' (--refit 2) is a documented NEGATIVE "
            "result: tight-sigma Gaussian refit after the solver fit "
            "hurts every bucket.",
        ])

    # --- matterport ---
    mp = rows_from_make_results_log("tmp/logs/matrix_mp_r5.log")
    mp += [r for r in (
        summarize_npy("res_matterport_super4pcs",
                      "super4pcs (4PCS, host C++)"),
        summarize_npy("res_matterport_gs", "gs (FPFH+RANSAC, host C++)"),
        summarize_npy("res_matterport_fgs",
                      "fgs (fast global reg., host C++)"),
        summarize_npy("res_matterport_cgs", "cgs (colored ICP, host C++)"),
    ) if r]
    out += section(
        "matterport", mp, 256, 3,
        "relativepose_tpu/data/pretrained/matterport.comp.npz",
        extra_notes=[
            "- no pose-finetuned row this round: the round-4 matterport "
            "base was already near the v3-scene ceiling, and the "
            "round-5 scannet experiment showed the all-overlap "
            "trans_weight=1.0 fine-tune recipe hurts a strong base "
            "model (docs/TRAINING.md); left for a controlled follow-up "
            "rather than shipping an untested row.",
        ])

    # --- scannet ---
    sn = rows_from_make_results_log("tmp/logs/matrix_scannet_r5.log")
    two = json_rows("tmp/logs/sn_2step.log", ["ours (2-step, --alterStep 2)"])
    # insert the 2-step row after ours_nr for readability
    idx = next((i for i, r in enumerate(sn)
                if r["tag"].startswith("ours_nr")), 0) + 1
    sn = sn[:idx] + two + sn[idx:]
    # the scannet make_results parent died mid-cgs (its orphaned child
    # was re-run standalone with resume); splice that row in
    cgs = summarize_npy("res_scannet_cgs", "cgs (colored ICP, host C++)")
    if cgs:
        sn.append(cgs)
    out += section(
        "scannet", sn, 256, 3,
        "relativepose_tpu/data/pretrained/scannet.comp.npz",
        extra_notes=[
            "- the kinect window observes ~7% of the pano (vs 25% for "
            "'second'-mask families): scannet is the hard setting by "
            "construction, mirroring the reference paper's dataset "
            "ordering (ScanNet >> SUNCG errors).",
            "- 'ours (2-step, --alterStep 2)' uses the reference's own "
            "recurrence-depth knob (evaluation.py:56,73): per-step "
            "instrumentation showed step 3 OVERSHOOTS on scannet's "
            ">=0.1-overlap pairs; at depth 2 rotation beats blind in "
            "every bucket (26.3/23.5/9.8 vs 96.9/26.9/10.9).",
            "- translation at >=0.1 overlap remains behind the identity "
            "prior (1.25/0.66 vs 1.13/0.60): those pairs barely move, "
            "so identity is a strong translation prior; the GT-oracle "
            "row (0.66/0.35) shows completion quality — not the solver "
            "— is the remaining limiter.",
        ])

    # --- robustness ablation ---
    if os.path.exists("ROBUSTNESS.md"):
        with open("ROBUSTNESS.md") as f:
            out += ["", f.read()]

    with open("RESULTS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote RESULTS.md ({len(su)} suncg rows, {len(mp)} matterport, "
          f"{len(sn)} scannet)")


if __name__ == "__main__":
    main()
