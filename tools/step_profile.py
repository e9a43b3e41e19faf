"""On-chip cost bisection for the batched contact step.

Round 1 (self-collision off) ran B=256 at 5457 steps/s; with detection on,
B=64 runs at ~450 steps/s.  This tool isolates where contact time goes.
One mode per process (a crashed worker poisons the process):

  full        — chunked rollout throughput, self-collision ON (production)
  noself      — same with self_collision_enabled=False (round-1 shape)
  nofric      — detection + layering + tables built each step, but the
                self-friction force is never applied (REAL build-time
                ablation via SelfColConfig.ablate — the round-3 monkey-patch
                variant measured nothing, see ADVICE r3)
  detectonly  — detection runs each step; layering/tables/friction skipped
  layers1     — self-collision on with max_layers=1
  detect      — detection pipeline stage timings at B (kernel / +extract /
                +assign_layers / +tables), contact-rich squashed states

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
                    choices=["full", "noself", "detect", "nofric",
                             "detectonly", "layers1"])
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--chunks", type=int, default=10,
                    help="number of 25-step chunks to run (250 = full ep)")
    ap.add_argument("--method", default=None,
                    help="self-collision detector override")
    ap.add_argument("--fric-unroll", type=int, default=0,
                    help="static friction unroll bound (0 = dynamic while)")
    ap.add_argument("--fric-impl", default="auto",
                    choices=["auto", "compact", "tables", "pallas"],
                    help="friction implementation (see SelfColConfig)")
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
    if args.mode == "nofric":
        kw["self_ablate"] = "nofric"
    if args.mode == "detectonly":
        kw["self_ablate"] = "detect_only"
    if args.fric_unroll:
        kw["self_friction_unroll"] = args.fric_unroll
    if args.fric_unroll:
        kw["self_friction_impl"] = "tables"
    elif args.fric_impl != "auto":
        kw["self_friction_impl"] = args.fric_impl
    t0 = time.time()
    sim = ClothSim(scene, **kw)
    print(f"sim built in {time.time() - t0:.0f}s "
          f"(method={getattr(sim.self_cfg, 'method', None)} "
          f"ablate={getattr(sim.self_cfg, 'ablate', None)})", flush=True)

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

        stages = {}
        if cfg.method == "pallas":
            # production pipeline: symmetric kernel -> dense layering
            n_pad = cfg.allowed.shape[0]

            def kernel_only(xb, vb):
                geom = scp.build_geom(xb, vb, sim.scene_dev.radii, sim.h,
                                      n_pad)
                tbl = scp._detect_partners_fn(
                    cfg.k_partners, False, triu_only=False)(geom,
                                                            cfg.allowed)
                return tbl.sum()
            stages["kernel"] = kernel_only

            def tabled(xb, vb):
                tab, ovf = scp.detect_tables_pallas(
                    cfg.allowed, sim.scene_dev.radii, xb, vb, sim.h,
                    cfg.k_partners, cfg.max_layers)
                return (tab.partner >= 0).sum(), ovf
            stages["tables"] = tabled
        else:
            def detect_set(xb, vb):
                return sc.detect_self_collisions_matrix(
                    cfg.allowed, sim.scene_dev.radii, xb, vb, sim.h,
                    cfg.k_partners, cfg.cap_pairs)

            def extract(xb, vb):
                cs = detect_set(xb, vb)
                return cs.mask.sum(), cs.overflow
            stages["extract"] = extract

            def tabled(xb, vb):
                cs = detect_set(xb, vb)
                cs = sc.assign_layers(cs, sim.n, cfg.max_layers)
                tb = sc.build_layer_tables(cs, sim.n, cfg.max_layers)
                return cs.mask.sum(), tb.n_layers
            stages["tables"] = tabled

        out = {"mode": "detect", "B": B, "method": cfg.method}
        for name, fn in stages.items():
            f = jax.jit(jax.vmap(fn))
            r = f(x, v)
            jax.block_until_ready(r)
            t0 = time.time()
            N_CALLS = 20
            for _ in range(N_CALLS):
                r = f(x, v)
            jax.block_until_ready(r)
            out[f"ms_{name}"] = round((time.time() - t0) / N_CALLS * 1e3, 2)
        print(json.dumps(out), flush=True)
        return

    # truncate the horizon to chunks*CHUNK for faster bisection
    sim.n_steps = min(sim.n_steps, args.chunks * CHUNK)
    p_inv = sim.p_inv(base)
    xfs = sim.x_fixed_seq(base)

    t0 = time.time()
    sps, conv, iters, ips = forward_throughput(sim, base, p_inv, xfs, B)
    mode_tag = args.mode + (f"_unroll{args.fric_unroll}"
                            if args.fric_unroll else
                            f"_{args.fric_impl}")
    print(json.dumps({"mode": mode_tag, "B": B, "steps": sim.n_steps,
                      "steps_per_sec": round(sps, 1),
                      "conv_frac": round(conv, 3),
                      "mean_iters": round(iters, 1),
                      "compile_plus_run_s": round(time.time() - t0, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
