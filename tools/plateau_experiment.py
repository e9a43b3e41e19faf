"""Does a shorter f32 plateau window change the physics?

The forward PD loop exits when the best iterate has not improved for
`plateau_window` sweeps (the f32 rounding-floor exit; f64 hits eps
first).  Measured mean iterations at window 12 are ~15.5/step — i.e.
~12 of them are pure confirmation.  This compares windows on the SAME
tshirt wind episode against the f64 eps=1e-8 reference trajectory
(output/bench_f64_traj.npz, bench_f64_cpu.py):

  per window: single-rollout chunked f32 episode on chip -> mean iters,
  RMSE vs f64 at steps 125/250, max |x_w - x_12| vs the window-12 run.

Usage: python tools/plateau_experiment.py [--windows 12,8,6,4]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", default="12,8,6")
    ap.add_argument("--f64", default="output/bench_f64_traj.npz")
    args = ap.parse_args()
    windows = [int(w) for w in args.windows.split(",")]

    import jax
    import jax.numpy as jnp

    from diffcloth_tpu.core.sim import ClothSim
    from diffcloth_tpu.geometry import builder as gb
    from diffcloth_tpu.tasks.registry import TSHIRT_SCENE

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    x64 = np.load(args.f64)["x"] if os.path.exists(args.f64) else None
    scene = gb.build_scene(TSHIRT_SCENE)
    out = {}
    ref_x = None
    for w in windows:
        sim = ClothSim(scene, plateau_window=w)
        base = sim.default_params()._replace(
            wind=jnp.array([0.04, 0.004, 0.04], jnp.float32),
            wind_freq=jnp.asarray(10.0, jnp.float32),
            wind_phase=jnp.asarray(0.5, jnp.float32))
        t0 = time.time()
        recs = sim.rollout_chunked(base, chunk=25)
        jax.block_until_ready(recs.steps.x)
        X = np.asarray(recs.steps.x, np.float64)
        iters = np.asarray(recs.steps.iters)
        conv = np.asarray(recs.steps.converged)
        row = {"mean_iters": round(float(iters.mean()), 2),
               "conv_frac": round(float(conv.mean()), 3),
               "wall_s": round(time.time() - t0, 1)}
        if x64 is not None:
            rmse = np.sqrt(np.mean((X - x64) ** 2, axis=(1, 2)))
            row["rmse_vs_f64_step125"] = float(np.format_float_scientific(
                rmse[124], 3))
            row["rmse_vs_f64_step250"] = float(np.format_float_scientific(
                rmse[-1], 3))
        if ref_x is None:
            ref_x = X
        else:
            row["max_dx_vs_w12"] = float(np.format_float_scientific(
                np.abs(X - ref_x).max(), 3))
        out[f"window{w}"] = row
        print(json.dumps({f"window{w}": row}), flush=True)
    print("RESULTS", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
