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
from diffcloth_tpu.optim.lbfgsb import (LbfgsResult, minimize_lbfgsb,
                                        minimize_lbfgsb_population)
from diffcloth_tpu.tasks.setup import TaskSetup, build_task


def _filter_restarts(helper: OptimizeHelper, x0: np.ndarray,
                     n_restarts: int, base_seed: int) -> np.ndarray:
    """Evaluate the default guess + n_restarts bounded random candidates
    and return the lowest-loss valid one.  One vmapped batched forward
    when the task's parameters share the prefactorization (can_batch);
    serial fallback otherwise (stiffness/density candidates each need
    their own refactorization).  reference: OptimizeHelper.cpp:316-359."""
    cands = [x0] + [helper.random_param(base_seed + 1 + i)
                    for i in range(n_restarts)]
    if helper.can_batch and len(cands) > 1:
        losses = helper.batched_loss(np.stack(cands))
    else:
        losses = np.array([helper.loss(c) for c in cands])
    losses = np.where(np.isfinite(losses), losses, np.inf)
    return cands[int(np.argmin(losses))]


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
               resume: bool = False, population: int = 0,
               export_iters: bool = False,
               **task_kwargs) -> DemoResult:
    """Run one trajectory/parameter optimization demo end-to-end.

    seed=None starts from the reference's default guess (param_guess:
    splines translated, otherwise mid-bounds); an integer seed draws a
    bounded random restart (reference `-seed N`, main.cpp:115-150).

    n_restarts>0 samples that many bounded random candidates, evaluates
    them all in ONE vmapped batched forward (serial fallback when the
    candidates change the prefactorization), filters out invalid ones
    (non-finite loss — the reference's validity filters reject exploded/
    degenerate rollouts, OptimizeHelper.cpp:316-359,445-488) and starts
    L-BFGS from the lowest-loss valid candidate.

    population>0 instead runs that many independent L-BFGS-B instances in
    LOCKSTEP from (default guess + population-1 random candidates), every
    evaluation one vmapped batch (minimize_lbfgsb_population); the best
    endpoint is reported.  Requires batchable parameters (helper.can_batch).

    export_iters=True additionally exports every accepted L-BFGS
    iterate's full trajectory (reference exportOptimizationRecords,
    Simulation.cpp:3963-4001 — iter0/.../iterK frame folders)."""
    import jax.numpy as jnp

    task = build_task(demo, dtype=dtype or jnp.float32, **task_kwargs)
    helper = OptimizeHelper(task.sim, task.mask, task.loss_fn(),
                            param_base=task.param_base)

    if seed is not None:
        x0 = helper.random_param(seed)
    else:
        x0 = default_guess_vec(task, helper)

    if population > 0:
        if not helper.can_batch:
            raise ValueError("population mode needs batchable parameters "
                             "(stiffness/density change the "
                             "prefactorization)")
        base_seed = 0 if seed is None else seed
        X0 = np.stack([x0] + [helper.random_param(base_seed + 1 + i)
                              for i in range(population - 1)])
        t0 = time.time()
        pop = minimize_lbfgsb_population(
            helper.batched_loss_and_grad, X0,
            helper.lower_bound, helper.upper_bound, maxiter=maxiter)
        wall = time.time() - t0
        res = pop.best
        if export_dir:
            export_optimization(export_dir, demo, helper, res)
            with open(os.path.join(export_dir, "population.json"),
                      "w") as fh:
                json.dump({"P": population,
                           "losses": pop.losses.tolist(),
                           "messages": pop.messages,
                           "n_iters": pop.n_iters.tolist(),
                           "n_outer": pop.n_outer,
                           "n_batched_evals": pop.n_batched_evals,
                           "wallclock_s": wall}, fh, indent=1)
        return DemoResult(task=task, helper=helper, result=res,
                          x_init=X0[0], wallclock_s=wall)

    if n_restarts > 0:
        x0 = _filter_restarts(helper, x0, n_restarts,
                              0 if seed is None else seed)

    done_iters = 0
    cbs = []
    if checkpoint_dir:
        from diffcloth_tpu.utils import checkpoint as ckpt
        if resume:
            step = ckpt.latest_step(checkpoint_dir)
            if step is not None:
                done_iters, state = ckpt.restore_checkpoint(checkpoint_dir,
                                                            step)
                x0 = np.asarray(state["x"], np.float64)

        cbs.append(lambda it, xk: ckpt.save_checkpoint(
            checkpoint_dir, done_iters + it, {"x": xk},
            metadata={"demo": demo}))

    iterates: list = []
    if export_iters:
        cbs.append(lambda it, xk: iterates.append(np.array(xk)))

    cb = None
    if cbs:
        def cb(it, xk):
            for f in cbs:
                f(it, xk)

    t0 = time.time()
    res = minimize_lbfgsb(helper.loss_and_grad, x0,
                          helper.lower_bound, helper.upper_bound,
                          maxiter=max(maxiter - done_iters, 1), callback=cb)
    wall = time.time() - t0

    if export_dir:
        export_optimization(export_dir, demo, helper, res,
                            iterates=iterates if export_iters else None)
    return DemoResult(task=task, helper=helper, result=res, x_init=x0,
                      wallclock_s=wall)


def solve_demo_tau_ladder(demo: str, *, taus=(2.0, 0.5, 0.1, 0.0),
                          maxiter_per_rung: int = 12,
                          final_maxiter: int = 25,
                          seed: Optional[int] = None,
                          n_restarts: int = 0,
                          population: int = 0,
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
    if n_restarts > 0 and population == 0:
        x = _filter_restarts(helper0, x, n_restarts,
                             0 if seed is None else seed)
    x_init = np.array(x)

    # population mode: carry the WHOLE candidate set across rungs — every
    # candidate warm-starts each tau from its own previous optimum, all
    # evaluations one vmapped batch (minimize_lbfgsb_population); the
    # winner at tau=0 is chosen by the HARD max (the reference loss)
    X = None
    if population > 0:
        base_seed = 0 if seed is None else seed
        X = np.stack([x] + [helper0.random_param(base_seed + 1 + i)
                            for i in range(population - 1)])
        hard_eval_b = task.sim.episode_loss_chunked(hard_fn, batched=True)

    t0 = time.time()
    rungs = []
    res = None
    helper = helper0
    for r, tau in enumerate(taus):
        helper = helper0 if tau == taus[0] else rung_helper(tau)
        it = final_maxiter if tau == 0.0 else maxiter_per_rung
        if population > 0:
            def _cb(k, Xk, Fk, _tau=tau):
                print(f"[ladder tau={_tau:g}] outer {k}: best "
                      f"{float(np.min(Fk)):.6f} median "
                      f"{float(np.median(Fk)):.6f}", flush=True)

            pop = minimize_lbfgsb_population(
                helper.batched_loss_and_grad, X, helper.lower_bound,
                helper.upper_bound, maxiter=it, callback=_cb)
            X = pop.X
            hards = np.asarray(hard_eval_b(helper.stack_vecs(X)))
            b = int(np.argmin(np.where(np.isfinite(hards), hards, np.inf)))
            x = X[b]
            res = pop.best
            res = dataclasses.replace(
                res, x=x, loss=float(pop.losses[b]))
            hard = float(hards[b])
            rungs.append({"tau": tau,
                          "smoothed_loss": float(pop.losses[b]),
                          "hard_max_loss": hard,
                          "hard_all": [round(float(hv), 4)
                                       for hv in hards],
                          "n_batched_evals": pop.n_batched_evals})
            print(f"[ladder] tau={tau:g}: best hard-max {hard:.6f} "
                  f"(pop {len(hards)}, {pop.n_batched_evals} batched "
                  f"evals)", flush=True)
            continue
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
                        res: LbfgsResult, iterates=None) -> None:
    """Persist per-iteration losses/params + final trajectory OBJ frames
    (reference exportStatistics / exportOptimizationRecords,
    Simulation.cpp:3963-4129).  `iterates` (accepted L-BFGS iterates from
    solve_demo(export_iters=True)) additionally dumps iter{k}/ frame
    folders, the reference's per-iteration debugging affordance
    (output/tshirt-exampleopt/iter0..18)."""
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
    if iterates:
        for k, xk in enumerate(iterates):
            rk = helper.sim.rollout_chunked(helper.vec_to_params(xk))
            ioexp.export_episode(os.path.join(folder, f"iter{k}"), rk,
                                 helper.sim.scene_host.tris)
