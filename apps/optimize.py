"""CLI mirroring the reference binary's interface.

reference: src/code/main.cpp:115-150 —
  ./DiffCloth -demo {wind,tshirt,sphere,hat,sock,slope,dress}
              -mode {optimize,simulate} -seed N -exp NAME

Usage:
  python apps/optimize.py --demo tshirt --mode optimize [--seed N]
                          [--maxiter M] [--exp NAME] [--cpu] [--x64]
  python apps/optimize.py --demo tshirt --mode simulate   # forward only
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", required=True,
                    choices=["wind", "wind_sim2real", "tshirt", "sphere",
                             "hat", "sock", "slope", "dress"])
    ap.add_argument("--mode", default="optimize",
                    choices=["optimize", "simulate", "visualize"])
    ap.add_argument("--seed", type=int, default=None,
                    help="random-restart seed (omit for default guess)")
    ap.add_argument("--restarts", type=int, default=0,
                    help="number of validity-filtered random restarts "
                         "(reference OptimizeHelper.cpp:316-359)")
    ap.add_argument("--maxiter", type=int, default=100)
    ap.add_argument("--tau", type=float, default=0.0,
                    help="softmax temperature for the keypoint loss "
                         "(sock); 0 = reference hard max")
    ap.add_argument("--max-backward-iters", type=int, default=None,
                    help="adjoint fixed-point cap override (reference "
                         "400, Simulation.cpp:1561)")
    ap.add_argument("--population", type=int, default=0,
                    help="lockstep multi-start: this many independent "
                         "L-BFGS instances advanced with batched vmapped "
                         "evaluations (optim.lbfgsb."
                         "minimize_lbfgsb_population)")
    ap.add_argument("--export-iters", action="store_true",
                    help="export every accepted L-BFGS iterate's full "
                         "trajectory (reference exportOptimizationRecords)")
    ap.add_argument("--tau-ladder", action="store_true",
                    help="graduated smoothing: anneal the keypoint tau "
                         "over rungs (2.0, 0.5, 0.1, 0), warm-starting "
                         "each from the previous optimum")
    ap.add_argument("--exp", default=None, help="experiment name")
    ap.add_argument("--gif", action="store_true",
                    help="with --mode visualize: write episode.gif")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--x64", action="store_true")
    args = ap.parse_args()

    if args.mode == "visualize":
        # offline replay of an exported run: the -mode visualize path
        # (reference main.cpp:33-45 renderFromFolder -> Viewer)
        from diffcloth_tpu.io import export as ioexp
        from diffcloth_tpu.io import viewer
        folder = os.path.join("output", args.exp) if args.exp else None
        if not folder or not os.path.isdir(folder):
            raise SystemExit("--mode visualize requires --exp pointing at "
                             "an exported folder under output/")
        sub = os.path.join(folder, "final")
        src = sub if os.path.isdir(sub) else folder
        xs, tris, info = ioexp.import_episode(src)
        out = (os.path.join(folder, "episode.gif") if args.gif
               else os.path.join(folder, "pngs"))
        viewer.render_episode(xs, tris, out)
        print(f"rendered {xs.shape[0]} frames -> {out}")
        return

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    dtype = jnp.float64 if args.x64 else jnp.float32
    exp = args.exp or f"{args.demo}-{time.strftime('%Y%m%d-%H%M%S')}"
    out_dir = os.path.join("output", exp)

    if args.mode == "simulate":
        from diffcloth_tpu.io import export as ioexp
        from diffcloth_tpu.tasks.setup import build_task
        from diffcloth_tpu.utils.timing import EpisodeStats
        task = build_task(args.demo, dtype=dtype)
        t0 = time.time()
        recs = task.sim.rollout_chunked(task.param_base)
        jax.block_until_ready(recs.steps.x)
        cold_s = time.time() - t0
        # warm re-run: the chunk executables are compiled now, so this is
        # the steady-state forward throughput (the cold number above is
        # dominated by XLA compilation)
        t0 = time.time()
        recs = task.sim.rollout_chunked(task.param_base)
        jax.block_until_ready(recs.steps.x)
        warm_s = time.time() - t0
        stats = EpisodeStats.from_records(recs, forward_s=warm_s)
        print(stats.report())
        print(f"[timing] cold (incl. compile) {cold_s:.1f}s, warm "
              f"{warm_s:.1f}s = {task.sim.n_steps / warm_s:.1f} steps/s",
              flush=True)
        ioexp.export_episode(out_dir, recs, task.sim.scene_host.tris,
                             stats={"episode_report": stats.report()})
        print("exported episode to", out_dir)
        return

    from diffcloth_tpu.optim.solver import solve_demo, solve_demo_tau_ladder
    if args.tau_ladder:
        if args.tau > 0:
            raise SystemExit("--tau is the fixed-temperature mode; "
                             "--tau-ladder anneals its own schedule — "
                             "pass one or the other")
        res = solve_demo_tau_ladder(args.demo, seed=args.seed,
                                    dtype=dtype, export_dir=out_dir,
                                    final_maxiter=args.maxiter // 4,
                                    maxiter_per_rung=max(
                                        args.maxiter // 8, 4),
                                    n_restarts=args.restarts,
                                    population=args.population)
        r = res.result
        print(f"demo={args.demo} (tau ladder) evals={r.n_evals} "
              f"final hard-max loss {r.loss:.6f} ({res.wallclock_s:.0f}s)")
        print("exported to", out_dir)
        return
    task_kwargs = {"keypoint_tau": args.tau} if args.tau > 0 else {}
    if args.max_backward_iters is not None:
        task_kwargs["max_backward_iters"] = args.max_backward_iters
    res = solve_demo(args.demo, seed=args.seed, maxiter=args.maxiter,
                     dtype=dtype, export_dir=out_dir,
                     n_restarts=args.restarts, population=args.population,
                     export_iters=args.export_iters, **task_kwargs)
    if args.tau > 0:
        # report the reference's hard-max loss at the smoothed optimum
        from diffcloth_tpu import losses as _losses
        import dataclasses as _dc
        hard = _losses.make_loss_fn(
            res.task.loss_type,
            _dc.replace(res.task.loss_info, keypoint_tau=0.0))
        params = res.helper.vec_to_params(res.result.x)
        recs = res.task.sim.rollout_chunked(params)
        print(f"hard-max loss at smoothed optimum: {float(hard(recs)):.6f}")
    r = res.result
    print(f"demo={args.demo} evals={r.n_evals} iters={r.n_iters} "
          f"loss {r.loss_history[0]:.6f} -> {r.loss:.6f} "
          f"({res.wallclock_s:.0f}s)")
    print("x* =", np.array2string(r.x, precision=5))
    print("exported to", out_dir)


if __name__ == "__main__":
    main()
