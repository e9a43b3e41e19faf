"""Sock-task diagnostics (VERDICT r2 #3).

The round-2 tau-ladder made zero hard-max progress (11.5929 at every rung).
This isolates why, on chip:

  1. hard-max loss + per-keypoint worst-candidate distances at
     (a) the task base parameters — the CORNERS_2_WEARSOCK spline already
         translated onto the foot (Simulation.cpp:2024-2053), i.e. the
         "does the trajectory pipeline work at all" probe — and
     (b) the reference's default optimization guess (endpoints shifted
         by (-1,1,0)/(1,1,0), OptimizeHelper.cpp:21-38);
  2. |dL/dspline| at the default guess (zero gradient vs line-search stall);
  3. a few validity-filtered random restarts' losses (restart headroom).

Usage: python tools/sock_diag.py [--restarts N]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def keypoint_report(recs, info):
    """Per-keypoint (frame, worst candidate distance) at the hard max."""
    import jax.numpy as jnp
    xs = np.asarray(recs.steps.x)
    frames = np.asarray(info.keypoint_frames)
    targets = np.asarray(info.keypoint_targets)
    cands = np.asarray(info.keypoint_candidates)
    rows = []
    for k in range(frames.shape[0]):
        x = xs[frames[k] - 1]
        cc = cands[k][cands[k] >= 0]
        d = np.linalg.norm(x[cc] - targets[k][None, :], axis=-1)
        rows.append({"k": k, "frame": int(frames[k]),
                     "worst_d": float(d.max()), "best_d": float(d.min()),
                     "worst_cand": int(cc[int(d.argmax())])})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffcloth_tpu.optim.helper import OptimizeHelper
    from diffcloth_tpu.optim.solver import default_guess_vec
    from diffcloth_tpu.tasks.setup import build_task

    t0 = time.time()
    task = build_task("sock", dtype=jnp.float32)
    sim = task.sim
    helper = OptimizeHelper(sim, task.mask, task.loss_fn(),
                            param_base=task.param_base)
    print(f"task built in {time.time() - t0:.0f}s; n={sim.n} "
          f"steps={sim.n_steps} n_params={helper.n_params}", flush=True)

    x_base = helper.params_to_vec(task.param_base)
    x_guess = default_guess_vec(task, helper)

    for name, x in (("base(on-foot spline)", x_base),
                    ("default-guess(shifted)", x_guess)):
        t0 = time.time()
        params = helper.vec_to_params(x)
        recs = sim.rollout_chunked(params)
        L = float(task.loss_fn()(recs))
        conv = np.asarray(recs.steps.converged)
        ovf = np.asarray(recs.steps.selfcol_overflow)
        print(f"\n== {name}: hard loss {L:.6f} "
              f"converged {conv.sum()}/{conv.size} overflow {ovf.any()} "
              f"({time.time() - t0:.0f}s)", flush=True)
        for r in keypoint_report(recs, task.loss_info):
            print("   ", json.dumps(r), flush=True)

    # gradient magnitude at the default guess
    t0 = time.time()
    L, g = helper.loss_and_grad(x_guess)
    gn = np.linalg.norm(g)
    print(f"\ndefault-guess: L={L:.6f} |dL/dx|={gn:.4e} "
          f"max|g_i|={np.abs(g).max():.4e} ({time.time() - t0:.0f}s)",
          flush=True)
    # per-spline-point breakdown (9 slots each)
    F = task.param_base.spline.shape[0]
    for f in range(F):
        gi = g[f * 9:(f + 1) * 9]
        print(f"  spline[{f}] |g|={np.linalg.norm(gi):.4e} "
              f"p1 {gi[:3].round(5).tolist()}", flush=True)

    # restart headroom
    loss_eval = helper.loss
    for i in range(args.restarts):
        t0 = time.time()
        cand = helper.random_param(1 + i)
        li = loss_eval(cand)
        print(f"restart seed {1 + i}: loss {li:.6f} "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
