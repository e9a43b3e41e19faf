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
        start = task.param_base
        if task.mask.control_points:
            # reference default guess: spline endpoints translated by
            # (-1,1,0) for the first two splines, (1,1,0) for the rest
            # (OptimizeHelper ctor, OptimizeHelper.cpp:21-38)
            sp = _np.array(start.spline)
            F = sp.shape[0]
            for f in range(F):
                d = _np.array([-1.0, 1.0, 0.0]) if f < 2 else                     _np.array([1.0, 1.0, 0.0])
                sp[f, 0:3] += d   # p1
                sp[f, 3:6] += d   # m0 = p1 - p0 (+yUp e_y): shifts with p1
                sp[f, 6:9] += d
            import jax.numpy as _jnp
            start = start._replace(spline=_jnp.asarray(sp, task.sim.dtype))
        x0 = helper.params_to_vec(start)
        # mid-bounds fallback for entries whose base value is out of bounds
        lb, ub = helper.lower_bound, helper.upper_bound
        mid = 0.5 * (lb + ub)
        bad = (x0 < lb) | (x0 > ub)
        x0 = np.where(bad, mid, x0)

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
    recs = helper.sim.rollout(params)
    stats = EpisodeStats.from_records(recs, forward_s=_time.time() - t0)
    ioexp.export_episode(os.path.join(folder, "final"), recs,
                         helper.sim.scene_host.tris,
                         stats={"episode_report": stats.report()})
