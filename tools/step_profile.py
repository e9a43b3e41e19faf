"""On-chip cost bisection for the batched contact step (round-3 #1).

Round 1 (self-collision off) ran B=256 at 5457 steps/s; with detection on,
B=64 runs at ~237 steps/s and B=256 crashes the TPU worker regardless of
detector.  One mode per process (a crashed worker poisons the process):

  full     — chunked rollout throughput, self-collision ON (default method)
  noself   — same with self_collision_enabled=False (round-1 shape)
  detect   — detection+assign_layers only, per-call wall time at B
  nofric   — detection on, but friction force zeroed (isolates the layered
             Gauss-Seidel + the extra per-iteration AtA apply)
  layers1  — self-collision on with max_layers=1

Usage: python tools/step_profile.py --mode full --B 64
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
    ap.add_argument("--mode", default="full",
                    choices=["full", "noself", "detect", "nofric", "layers1"])
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--chunks", type=int, default=10,
                    help="number of 25-step chunks to run (250 = full ep)")
    ap.add_argument("--method", default=None,
                    help="self-collision detector override")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as entrymod
    from bench import forward_throughput, CHUNK
    from diffcloth_tpu.config import SimFlags, WindConfig
    from diffcloth_tpu.core.sim import ClothSim
    from diffcloth_tpu.geometry import builder as gb
    from diffcloth_tpu.tasks.registry import TSHIRT_SCENE

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scene = gb.build_scene(TSHIRT_SCENE)
    kw = {}
    if args.method:
        kw["self_method"] = args.method
    if args.mode == "noself":
        kw["flags"] = SimFlags(wind_enabled=True,
                               self_collision_enabled=False)
    if args.mode == "layers1":
        kw["self_max_layers"] = 1
    t0 = time.time()
    sim = ClothSim(scene, **kw)
    print(f"sim built in {time.time() - t0:.0f}s "
          f"(method={getattr(sim.self_cfg, 'method', None)})", flush=True)

    base = sim.default_params()._replace(
        wind=jnp.array([0.04, 0.004, 0.04], jnp.float32),
        wind_freq=jnp.asarray(10.0, jnp.float32),
        wind_phase=jnp.asarray(0.5, jnp.float32))
    B = args.B

    if args.mode == "detect":
        from diffcloth_tpu.core import selfcol as sc
        from diffcloth_tpu.core import selfcol_pallas as scp
        cfg = sim.self_cfg
        # y-squashed states with REAL contacts (~231 pairs at scale 0.45 on
        # the tshirt mesh): the kernel's merge path and assign_layers rounds
        # only execute when hits exist, so rest-state timing measures just
        # the fast path
        x0 = np.asarray(base.x0)
        c = x0.mean(axis=0)
        rngs = np.random.RandomState(0).rand(B)
        xs = np.stack([(x0 - c) * np.array([1.0, 0.45 * (0.9 + 0.2 * s),
                                            1.0]) + c for s in rngs])
        x = jnp.asarray(xs, jnp.float32)
        v = jnp.zeros_like(x)

        def det(xb, vb):
            if cfg.method == "pallas":
                cs = scp.detect_self_collisions_pallas(
                    cfg.allowed, sim.scene_dev.radii, xb, vb, sim.h,
                    cfg.k_partners, cfg.cap_pairs)
            else:
                cs = sc.detect_self_collisions_matrix(
                    cfg.allowed, sim.scene_dev.radii, xb, vb, sim.h,
                    cfg.k_partners, cfg.cap_pairs)
            cs = sc.assign_layers(cs, sim.n, cfg.max_layers)
            return cs.mask.sum(), cs.overflow

        f = jax.jit(jax.vmap(det))
        out = f(x, v)
        jax.block_until_ready(out)
        t0 = time.time()
        N_CALLS = 20
        for _ in range(N_CALLS):
            out = f(x, v)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / N_CALLS * 1e3
        print(json.dumps({"mode": "detect", "B": B,
                          "method": cfg.method,
                          "ms_per_call": round(ms, 2),
                          "ms_per_episode_250": round(ms * 250, 0)}),
              flush=True)
        return

    # truncate the horizon to chunks*CHUNK for faster bisection
    sim.n_steps = min(sim.n_steps, args.chunks * CHUNK)
    p_inv = sim.p_inv(base)
    xfs = sim.x_fixed_seq(base)

    if args.mode == "nofric":
        # rebuild the step with friction zeroed via mu=0 for obstacles and
        # monkey-patched self_friction
        from diffcloth_tpu.core import selfcol as sc
        orig = sc.self_friction
        sc.self_friction = lambda f, c, m, r, ml, dff, **k: r
        from diffcloth_tpu.core import step as step_mod
        sim.step, sim.residual = step_mod.make_step(
            sim.scene_dev, sim.stage_dev, sim.prims, h=sim.h,
            wind_config=sim.cfg.wind_config, flags=sim.flags,
            eps_forward=sim.eps_forward, eps_backward=sim.eps_backward,
            self_cfg=sim.self_cfg, dense=sim.dense, sparse=sim.sparse)
        sim.steps = [sim.step]
        sim.residuals = [sim.residual]
        sc.self_friction = orig

    t0 = time.time()
    sps, conv, iters, ips = forward_throughput(sim, base, p_inv, xfs, B)
    print(json.dumps({"mode": args.mode, "B": B, "steps": sim.n_steps,
                      "steps_per_sec": round(sps, 1),
                      "conv_frac": round(conv, 3),
                      "mean_iters": round(iters, 1),
                      "compile_plus_run_s": round(time.time() - t0, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
