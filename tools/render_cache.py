"""Pre-render synthetic pair caches (host-side, no device work).

Usage: python tools/render_cache.py <family> <n_train> [--jitter 1]
Renders train (seed 0), val (seed 10000, n/8), and the 64-pair eval set
(seed 20000, no jitter) into RPTPU_SYNTH_CACHE.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from relativepose_tpu.data import datasets as dsets

family = sys.argv[1]
n_train = int(sys.argv[2])
jitter = "--jitter" in sys.argv
cache = os.environ.get("RPTPU_SYNTH_CACHE", "tmp/synth_cache")
jobs = [
    (0, n_train, jitter),
    (10_000, max(64, n_train // 8), jitter),
    (20_000, 64, False),
]
for seed, n, jit in jobs:
    src = dsets.SyntheticPairs(family, n=n, seed=seed, cache_dir=cache,
                               cache_size=1, view_detail_jitter=jit)
    t0 = time.time()
    for i in range(n):
        src[i]
        if (i + 1) % 256 == 0:
            print(f"{family} seed={seed} {i+1}/{n} "
                  f"({(time.time()-t0)/(i+1):.2f} s/pair)", flush=True)
    print(f"done {family} seed={seed} n={n} jitter={jit} "
          f"in {time.time()-t0:.0f}s", flush=True)
