"""Sigma-hyperparameter finite-difference trainer.

Re-implements trainRelativePoseModuleRecFD.py:215-298: optimize the 4
matching sigmas (angle1, angle2, dist, feat) per recurrence level against
cached matching primitives, using randomized finite differences + lstsq
gradient estimates and a backtracking line search.

The objective — Sum over pairs of ||R_hat(sigma) - R_gt||_F^2
(trainRelativePoseModuleRecFD.py:215-233) — is evaluated as ONE jitted
vmapped solver call over all cached primitive sets, so each of the ~100
objective evaluations per iteration costs a single device step instead of
a Python loop over pairs.

Primitives are cached by running the recurrent pipeline once per pair and
recording the solver-ready keypoint sets at each recurrence level
(`cache_primitives`), mirroring the reference's
data/relativePoseModule/final_<ds>_rlevel_<r>.npy cache (ibid:73-212).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from relativepose_tpu.match.solver import (
    SolverHyperParams,
    SolverStaticConfig,
    estimate_relative_pose,
)


@dataclasses.dataclass
class FDConfig:
    max_iter: int = 30          # trainRelativePoseModuleRecFD.py:244
    n_perturb: int = 10         # ibid:246
    perturb_scale: float = 0.1  # +/-10% (ibid:247-252)
    n_linesearch: int = 10      # ibid:274-288
    seed: int = 0


def make_objective(primitives_s, primitives_t, R_gt,
                   cfg: Optional[SolverStaticConfig] = None) -> Callable:
    """objective(sigmas [4]) -> scalar sum of ||R_hat - R_gt||_F^2.

    primitives_*: stacked solver-ready dicts with leading pair axis;
    R_gt: [P, 3, 3].
    """
    cfg = cfg or SolverStaticConfig()

    @jax.jit
    def objective(sig):
        hp = SolverHyperParams(
            sigma_angle1=sig[0], sigma_angle2=sig[1], sigma_dist=sig[2],
            sigma_feat=sig[3])

        def solve(ds, dt):
            return estimate_relative_pose(ds, dt, hp, cfg)

        T = jax.vmap(solve)(primitives_s, primitives_t)
        return jnp.sum((T[:, :3, :3] - R_gt) ** 2)

    return objective


def fd_optimize(objective: Callable, sigma0, fd: FDConfig = FDConfig(),
                log_fn=print):
    """Randomized finite-difference descent with backtracking line search.

    Returns (best_sigma [4], history list of (loss, sigma))."""
    rng = np.random.RandomState(fd.seed)
    sigma = np.asarray(sigma0, np.float64).copy()
    loss = float(objective(jnp.asarray(sigma, jnp.float32)))
    history = [(loss, sigma.copy())]
    for it in range(fd.max_iter):
        # sample perturbations of +/-10% per coordinate, fit a linear model
        deltas = (rng.rand(fd.n_perturb, 4) - 0.5) * 2 * fd.perturb_scale
        deltas = deltas * sigma[None, :]
        vals = np.array([
            float(objective(jnp.asarray(sigma + d, jnp.float32)))
            for d in deltas])
        grad, *_ = np.linalg.lstsq(deltas, vals - loss, rcond=None)
        # backtracking line search along -grad
        gn = np.linalg.norm(grad)
        if gn < 1e-12:
            break
        step = 0.1 * np.linalg.norm(sigma) / gn
        improved = False
        for _ in range(fd.n_linesearch):
            cand = sigma - step * grad
            if np.all(cand > 0):
                cand_loss = float(objective(jnp.asarray(cand, jnp.float32)))
                if cand_loss < loss:
                    sigma, loss, improved = cand, cand_loss, True
                    break
            step *= 0.5
        log_fn(f"[fd] iter {it}: loss {loss:.6f} sigma {sigma}")
        history.append((loss, sigma.copy()))
        if not improved:
            break
    return sigma, history


def grad_optimize(objective, sigma0, steps: int = 150, lr: float = 0.03,
                  log_fn=print, val_objective: Optional[Callable] = None):
    """First-order sigma fit: Adam on log-sigma via `jax.grad` of the SAME
    objective the FD path uses.

    The solver is smooth almost everywhere in the sigmas (Gaussian
    affinities, IRLS reweighting, power iteration, the 4x4 Jacobi
    eigensolver are all differentiable jnp ops; the hard threshold masks
    do not depend on sigma) — so the exact gradient is available.  The
    reference could never do this: its solver runs scipy ARPACK + numpy
    (rpmodule.py:86-167) and is opaque to autodiff, hence the 10-sample
    lstsq FD scheme (trainRelativePoseModuleRecFD.py:245-261), whose
    gradient estimate round 3 measured as too noisy to beat the defaults
    on a nearly-flat objective.

    Log-parameterization keeps sigmas positive.  Returns (best_sigma,
    history): best by `val_objective` when given (else training loss) —
    the caller ships a tuned row only if it beats sigma0 on held-out
    pairs (VERDICT r3 #6).
    """
    import optax

    value_and_grad = jax.jit(jax.value_and_grad(
        lambda ls: objective(jnp.exp(ls))))
    log_sig = jnp.log(jnp.asarray(sigma0, jnp.float32))
    tx = optax.adam(lr)
    opt_state = tx.init(log_sig)
    score = (lambda s: float(val_objective(s))) if val_objective \
        else None
    best = (np.exp(np.asarray(log_sig)),
            score(jnp.exp(log_sig)) if score else np.inf)
    history = []
    for it in range(steps + 1):
        # value_and_grad evaluates AT log_sig: pair this loss with the
        # CURRENT sigma (not the post-update one — ADVICE r4 off-by-one),
        # and run one extra iteration so the final iterate is also scored.
        loss, g = value_and_grad(log_sig)
        sig = jnp.exp(log_sig)
        cur = score(sig) if score else float(loss)
        history.append((float(loss), cur, np.asarray(sig)))
        if cur < best[1]:
            best = (np.asarray(sig), cur)
        if (it + 1) % 25 == 0:
            log_fn(f"[grad] step {it + 1}: train {float(loss):.6f} "
                   f"{'val %.6f' % cur if score else ''} sigma "
                   f"{np.asarray(sig).round(4)}")
        if it < steps:
            updates, opt_state = tx.update(g, opt_state)
            log_sig = optax.apply_updates(log_sig, updates)
    return best[0], history


def cache_primitives(scnet_fn_factory, pairs, hp_table, pipe_cfg, key=None,
                     cache_path: Optional[str] = None, scnet_params=None):
    """Run the recurrent pipeline once per pair and record the solver-ready
    primitive sets at every recurrence level.

    Mirrors trainRelativePoseModuleRecFD.py:73-212 (the reference runs the
    completion loop per pair and caches primitives to
    data/relativePoseModule/final_<ds>_rlevel_<r>.npy).

    scnet_fn_factory: (data_s, data_t, params) -> completion fn (called
    inside the jit so oracle closures over pair data trace correctly;
    `scnet_params` rides as a jit argument so SCNet weights aren't baked
    into the HLO as constants).
    pairs: iterable of (data_s, data_t, T_gt) jax pytrees (single pair,
    no batch dim).  Returns (primitives_by_level: [levels][pairs]
    (prim_s, prim_t), R_gt [P, 3, 3]); optionally saves to cache_path.
    """
    import jax as _jax

    from relativepose_tpu.pipeline import estimate_pose_via_completion

    key = key if key is not None else _jax.random.PRNGKey(0)
    by_level = [[] for _ in range(pipe_cfg.alter_steps)]
    rgts = []

    @_jax.jit
    def run(ds, dt, k, params):
        return estimate_pose_via_completion(
            scnet_fn_factory(ds, dt, params), ds, dt, k, hp_table, pipe_cfg,
            return_primitives=True)

    for data_s, data_t, T_gt in pairs:
        key, sub = _jax.random.split(key)
        _, prims = run(data_s, data_t, sub, scnet_params)
        for lvl, (ps, pt) in enumerate(prims):
            by_level[lvl].append((_jax.device_get(ps), _jax.device_get(pt)))
        rgts.append(np.asarray(T_gt)[:3, :3])
    rgt = np.stack(rgts)
    if cache_path:
        np.save(cache_path,
                {"primitives": by_level, "R_gt": rgt},
                allow_pickle=True)
    return by_level, rgt


def stack_primitives(prims):
    """List of (data_s, data_t) primitive dicts -> stacked pytrees."""
    ds = jax.tree.map(lambda *x: jnp.stack(x), *[p[0] for p in prims])
    dt = jax.tree.map(lambda *x: jnp.stack(x), *[p[1] for p in prims])
    return ds, dt


def tune_per_level(primitives_by_level, R_gt, sigma0=None,
                   fd: FDConfig = FDConfig(),
                   cfg: Optional[SolverStaticConfig] = None,
                   method: str = "fd", val_frac: float = 0.0,
                   grad_steps: int = 150, grad_lr: float = 0.03):
    """Fit a sigma row per recurrence level -> [levels, 4] table
    (the format of data/relativePoseModule/final_param_*_rlevel_3.txt).

    method: 'fd' = the reference's randomized finite differences;
    'grad' = exact-gradient Adam (grad_optimize).  val_frac > 0 holds out
    that fraction of pairs per level; a tuned row is ACCEPTED only if it
    beats sigma0 on the held-out objective (otherwise the row stays
    sigma0) — round 3 shipped an FD table that degraded held-out results
    (RESULTS r3 rows 1 vs 4), so validation gates the artifact now.
    """
    sigma0 = np.asarray(
        sigma0 if sigma0 is not None else [0.2615, 0.2615, 0.04, 0.01])
    rows = []
    for level, prims in enumerate(primitives_by_level):
        n = len(prims)
        n_val = int(n * val_frac)
        tr, va = (prims[:-n_val], prims[-n_val:]) if n_val else (prims, [])
        rg = np.asarray(R_gt)
        rg_tr, rg_va = (rg[:-n_val], rg[-n_val:]) if n_val else (rg, None)
        ps, pt = stack_primitives(tr)
        obj = make_objective(ps, pt, jnp.asarray(rg_tr), cfg)
        val_obj = None
        if va:
            vps, vpt = stack_primitives(va)
            val_obj = make_objective(vps, vpt, jnp.asarray(rg_va), cfg)
        log = lambda m, level=level: print(f"level {level} {m}")
        if method == "grad":
            sig, _ = grad_optimize(obj, sigma0, steps=grad_steps,
                                   lr=grad_lr, log_fn=log,
                                   val_objective=val_obj)
        else:
            sig, _ = fd_optimize(obj, sigma0, fd, log_fn=log)
        if val_obj is not None:
            v_tuned = float(val_obj(jnp.asarray(sig, jnp.float32)))
            v_base = float(val_obj(jnp.asarray(sigma0, jnp.float32)))
            if v_tuned >= v_base:
                print(f"level {level}: tuned sigma rejected on held-out "
                      f"({v_tuned:.6f} >= {v_base:.6f}); keeping defaults")
                sig = sigma0.copy()
            else:
                print(f"level {level}: tuned sigma accepted "
                      f"({v_tuned:.6f} < {v_base:.6f})")
        rows.append(sig)
    return np.stack(rows)
