"""Demo orchestration: task setup -> (optional random restart) -> L-BFGS-B.

reference: BackwardTaskSolver::solveDemo / optimizeLBFGS
(BackwardTaskSolver.cpp:11-66) and getOptimizeHelper (:77-137).
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import numpy as np

from diffcloth_tpu.optim.helper import OptimizeHelper
from diffcloth_tpu.optim.lbfgsb import LbfgsResult, minimize_lbfgsb
from diffcloth_tpu.tasks.setup import TaskSetup, build_task


def default_guess_vec(task: TaskSetup, helper: OptimizeHelper) -> np.ndarray:
    """The reference's default initial guess as a packed vector: spline
    endpoints translated by (-1,1,0) for the first two splines and (1,1,0)
    for the rest (OptimizeHelper ctor, OptimizeHelper.cpp:21-38);
    out-of-bounds entries snapped to mid-bounds."""
    import numpy as _np

    start = task.param_base
    if task.mask.control_points:
        sp = _np.array(start.spline)
        F = sp.shape[0]
        for f in range(F):
            d = (_np.array([-1.0, 1.0, 0.0]) if f < 2
                 else _np.array([1.0, 1.0, 0.0]))
            sp[f, 0:3] += d   # p1
            sp[f, 3:6] += d   # m0 = p1 - p0 (+yUp e_y): shifts with p1
            sp[f, 6:9] += d
        import jax.numpy as _jnp
        start = start._replace(spline=_jnp.asarray(sp, task.sim.dtype))
    x0 = helper.params_to_vec(start)
    lb, ub = helper.lower_bound, helper.upper_bound
    mid = 0.5 * (lb + ub)
    bad = (x0 < lb) | (x0 > ub)
    return np.where(bad, mid, x0)


@dataclasses.dataclass
class DemoResult:
    task: TaskSetup
    helper: OptimizeHelper
    result: LbfgsResult
    x_init: np.ndarray
    wallclock_s: float


def solve_demo(demo: str, *, seed: Optional[int] = None, maxiter: int = 100,
               dtype=None, export_dir: Optional[str] = None,
               n_restarts: int = 0, checkpoint_dir: Optional[str] = None,
               resume: bool = False,
               **task_kwargs) -> DemoResult:
    """Run one trajectory/parameter optimization demo end-to-end.

    seed=None starts from the reference's default guess (param_guess:
    splines translated, otherwise mid-bounds); an integer seed draws a
    bounded random restart (reference `-seed N`, main.cpp:115-150).

    n_restarts>0 samples that many bounded random candidates, forward-
    simulates each, filters out invalid ones (non-finite loss — the
    reference's validity filters reject exploded/degenerate rollouts,
    OptimizeHelper.cpp:316-359,445-488) and starts L-BFGS from the
    lowest-loss valid candidate."""
    import jax.numpy as jnp

    import numpy as _np

    task = build_task(demo, dtype=dtype or jnp.float32, **task_kwargs)
    helper = OptimizeHelper(task.sim, task.mask, task.loss_fn(),
                            param_base=task.param_base)

    if seed is not None:
        x0 = helper.random_param(seed)
    else:
        x0 = default_guess_vec(task, helper)

    if n_restarts > 0:
        base_seed = 0 if seed is None else seed
        best, best_loss = x0, float(helper.loss(x0))
        for i in range(n_restarts):
            cand = helper.random_param(base_seed + 1 + i)
            li = float(helper.loss(cand))
            if np.isfinite(li) and li < best_loss:
                best, best_loss = cand, li
        x0 = best

    done_iters = 0
    cb = None
    if checkpoint_dir:
        from diffcloth_tpu.utils import checkpoint as ckpt
        if resume:
            step = ckpt.latest_step(checkpoint_dir)
            if step is not None:
                done_iters, state = ckpt.restore_checkpoint(checkpoint_dir,
                                                            step)
                x0 = np.asarray(state["x"], np.float64)

        def cb(it, xk):
            ckpt.save_checkpoint(checkpoint_dir, done_iters + it,
                                 {"x": xk}, metadata={"demo": demo})

    t0 = time.time()
    res = minimize_lbfgsb(helper.loss_and_grad, x0,
                          helper.lower_bound, helper.upper_bound,
                          maxiter=max(maxiter - done_iters, 1), callback=cb)
    wall = time.time() - t0

    if export_dir:
        export_optimization(export_dir, demo, helper, res)
    return DemoResult(task=task, helper=helper, result=res, x_init=x0,
                      wallclock_s=wall)


def solve_demo_tau_ladder(demo: str, *, taus=(2.0, 0.5, 0.1, 0.0),
                          maxiter_per_rung: int = 12,
                          final_maxiter: int = 25,
                          seed: Optional[int] = None,
                          n_restarts: int = 0,
                          dtype=None,
                          export_dir: Optional[str] = None) -> DemoResult:
    """Graduated-smoothing optimization for max-style losses (sock):
    anneal the keypoint-softmax temperature tau -> 0, warm-starting each
    rung from the previous optimum, and report the reference's hard-max
    loss at every rung.

    The hard max (Simulation.cpp:3440-3475) has a flat/kinked landscape —
    only one candidate per keypoint carries gradient — which is why the
    reference's default guess sits on an Armijo plateau.  The smoothed
    rungs (softmax-weighted mean over candidates) give every candidate
    gradient mass; the final tau=0 rung polishes on the exact reference
    loss.  All rungs share one ClothSim, so the expensive chunked episode
    executables compile once (sim._chunk_exec_cache)."""
    import jax.numpy as jnp

    from diffcloth_tpu import losses as _losses

    taus = list(taus)
    if taus[-1] != 0.0:
        taus.append(0.0)
    task = build_task(demo, dtype=dtype or jnp.float32,
                      keypoint_tau=taus[0])
    hard_fn = _losses.make_loss_fn(
        task.loss_type, dataclasses.replace(task.loss_info,
                                            keypoint_tau=0.0))
    # per-rung hard-loss reporting through the cached chunked executables
    # (a monolithic full-horizon rollout per rung is exactly the execution
    # shape the chunked adjoint exists to avoid on remote-TPU transports)
    hard_eval = task.sim.episode_loss_chunked(hard_fn)

    def rung_helper(tau):
        loss_fn = _losses.make_loss_fn(
            task.loss_type,
            dataclasses.replace(task.loss_info, keypoint_tau=tau))
        return OptimizeHelper(task.sim, task.mask, loss_fn,
                              param_base=task.param_base)

    helper0 = rung_helper(taus[0])
    if seed is not None:
        x = helper0.random_param(seed)
    else:
        x = default_guess_vec(task, helper0)
    if n_restarts > 0:
        base_seed = 0 if seed is None else seed
        best, best_loss = x, float(helper0.loss(x))
        for i in range(n_restarts):
            cand = helper0.random_param(base_seed + 1 + i)
            li = float(helper0.loss(cand))
            if np.isfinite(li) and li < best_loss:
                best, best_loss = cand, li
        x = best
    x_init = np.array(x)

    t0 = time.time()
    rungs = []
    res = None
    helper = helper0
    for r, tau in enumerate(taus):
        helper = helper0 if tau == taus[0] else rung_helper(tau)
        it = final_maxiter if tau == 0.0 else maxiter_per_rung
        res = minimize_lbfgsb(helper.loss_and_grad, x,
                              helper.lower_bound, helper.upper_bound,
                              maxiter=it)
        x = res.x
        params = helper.vec_to_params(x)
        hard = float(hard_eval(params))
        rungs.append({"tau": tau, "smoothed_loss": res.loss,
                      "hard_max_loss": hard, "n_evals": res.n_evals,
                      "n_iters": res.n_iters})
        print(f"[ladder] tau={tau:g}: smoothed {res.loss:.6f} "
              f"hard-max {hard:.6f} ({res.n_evals} evals)", flush=True)
    wall = time.time() - t0

    if export_dir:
        export_optimization(export_dir, demo, helper, res)
        with open(os.path.join(export_dir, "tau_ladder.json"), "w") as fh:
            json.dump({"taus": taus, "rungs": rungs,
                       "wallclock_s": wall}, fh, indent=1)
    return DemoResult(task=task, helper=helper, result=res, x_init=x_init,
                      wallclock_s=wall)


def export_optimization(folder: str, demo: str, helper: OptimizeHelper,
                        res: LbfgsResult) -> None:
    """Persist per-iteration losses/params + final trajectory OBJ frames
    (reference exportStatistics / exportOptimizationRecords,
    Simulation.cpp:3963-4129)."""
    os.makedirs(folder, exist_ok=True)
    log = {
        "demo": demo,
        "final_loss": res.loss,
        "n_iters": res.n_iters,
        "n_evals": res.n_evals,
        "converged": res.converged,
        "message": res.message,
        "loss_history": res.loss_history,
        "x_final": res.x.tolist(),
    }
    with open(os.path.join(folder, "optimization.json"), "w") as fh:
        json.dump(log, fh, indent=1)
    # final-trajectory export for offline viewing / replay, with per-step
    # solver stats (the reference's per-iter frame dumps + forwardLog
    # tables, Simulation.cpp:4003-4129)
    import time as _time

    from diffcloth_tpu.io import export as ioexp
    from diffcloth_tpu.utils.timing import EpisodeStats

    params = helper.vec_to_params(res.x)
    t0 = _time.time()
    recs = helper.sim.rollout_chunked(params)
    stats = EpisodeStats.from_records(recs, forward_s=_time.time() - t0)
    ioexp.export_episode(os.path.join(folder, "final"), recs,
                         helper.sim.scene_host.tris,
                         stats={"episode_report": stats.report()})
