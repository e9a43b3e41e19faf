"""VERDICT r4 #7: one tight-tolerance row on the target hardware.

Single-rollout tshirt forward episode ON THE TPU at the reference's
exact convergence regime (f64, eps_forward = 1e-8 — forwardLog.txt
Record 0 runs 201 iters/step there), chunked so no single execution
exceeds the remote transport's budget.

Usage: python tools/f64_tpu_row.py [--steps 250]
Appends f64_tpu_eps1e8_steps_per_sec to output/bench_extras.json.
"""
import argparse, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=250)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from diffcloth_tpu.config import SimFlags
    from diffcloth_tpu.core.sim import ClothSim
    from diffcloth_tpu.geometry import builder as gb
    from diffcloth_tpu.tasks.registry import TSHIRT_SCENE

    print("backend:", jax.default_backend(), flush=True)
    import dataclasses
    cfg = dataclasses.replace(TSHIRT_SCENE, step_num=args.steps)
    scene = gb.build_scene(cfg)
    sim = ClothSim(scene, dtype=jnp.float64,
                   flags=SimFlags(wind_enabled=True),
                   eps_forward=1e-8)
    params = sim.default_params()
    t0 = time.time()
    recs = sim.rollout_chunked(params, chunk=10)
    conv = np.asarray(recs.steps.converged)
    iters = np.asarray(recs.steps.iters)
    first = time.time() - t0
    print(f"cold: {first:.1f}s  conv {conv.mean():.3f} "
          f"iters mean {iters.mean():.1f}", flush=True)
    t0 = time.time()
    recs = sim.rollout_chunked(params, chunk=10)
    jax.block_until_ready(recs.steps.x)
    warm = time.time() - t0
    sps = args.steps / warm
    print(f"warm: {warm:.1f}s -> {sps:.2f} steps/s "
          f"(f64, eps 1e-8, single rollout, on-chip)", flush=True)

    path = "output/bench_extras.json"
    extras = {}
    if os.path.exists(path):
        extras = json.load(open(path))
    extras["f64_tpu_eps1e8_steps_per_sec"] = round(sps, 2)
    extras["f64_tpu_eps1e8_mean_iters"] = round(float(iters.mean()), 1)
    extras["f64_tpu_eps1e8_converged_frac"] = round(float(conv.mean()), 3)
    extras["f64_tpu_note"] = (
        f"our engine, TPU f64, reference tolerance 1e-8, {args.steps} "
        "steps single rollout (tools/f64_tpu_row.py); reference "
        "C++/OpenMP: 6.1 steps/s at 201 iters/step on its machine")
    json.dump(extras, open(path, "w"), indent=1)
    print("saved", path, flush=True)


if __name__ == "__main__":
    main()
