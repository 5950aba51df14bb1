"""Pre-render synthetic pair caches (host-side, no device work).

Usage: python tools/render_cache.py <family> <n_train> [--jitter]
           [--ramp 0.35] [--clutter 0] [--n_eval 64] [--eval_only]
Renders train (seed 0), val (seed 10000, n/8), and the n_eval-pair eval
set (seed 20000, no jitter) into RPTPU_SYNTH_CACHE.
"""
import argparse, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from relativepose_tpu.data import datasets as dsets

ap = argparse.ArgumentParser()
ap.add_argument("family")
ap.add_argument("n_train", type=int)
ap.add_argument("--jitter", action="store_true")
ap.add_argument("--ramp", type=float, default=0.35)
ap.add_argument("--clutter", type=int, default=0)
ap.add_argument("--n_eval", type=int, default=64)
ap.add_argument("--eval_only", action="store_true")
args = ap.parse_args()
family, n_train, jitter = args.family, args.n_train, args.jitter
cache = os.environ.get("RPTPU_SYNTH_CACHE", "tmp/synth_cache")
jobs = [
    (0, n_train, jitter),
    (10_000, max(64, n_train // 8), jitter),
    (20_000, args.n_eval, False),
]
if args.eval_only:
    jobs = jobs[-1:]
for seed, n, jit in jobs:
    src = dsets.SyntheticPairs(family, n=n, seed=seed, cache_dir=cache,
                               cache_size=1, view_detail_jitter=jit,
                               ramp_weight=args.ramp,
                               n_clutter=args.clutter)
    t0 = time.time()
    for i in range(n):
        src[i]
        if (i + 1) % 256 == 0:
            print(f"{family} seed={seed} {i+1}/{n} "
                  f"({(time.time()-t0)/(i+1):.2f} s/pair)", flush=True)
    print(f"done {family} seed={seed} n={n} jitter={jit} "
          f"in {time.time()-t0:.0f}s", flush=True)
