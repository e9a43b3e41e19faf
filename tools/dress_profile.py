"""On-chip cost dissection of the 7k-vertex dress step (VERDICT r3 #3).

Round 3 ran the dress forward at ~3000 ms/step (11.1 PD iters/step =>
~270 ms/iter) — far too slow for the adjoint sweep that a dress
optimization needs.  This times each candidate cost in isolation on the
real chip:

  detect   — pallas symmetric detection + dense layering per step
  solve    — the (n,n)@(n,3) dense P^{-1} matmul (HIGHEST precision)
  applyA   — sparse incidence operators: y = A x all four types
  applyAtA — A^T(A v) all four types
  proj     — projections from x (gathers + corotational math)
  friction — one layered Gauss-Seidel friction application (16 layers)
  iter     — one full PD iteration (btilde + AtA + friction + solve)
  step     — one full jitted step (detection + while-loop + aux)

Usage: python tools/dress_profile.py [--modes detect,solve,...]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(f, *args, n_calls=10):
    import jax
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_calls):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n_calls * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="detect,solve,applyA,applyAtA,proj,"
                                       "friction,step")
    args = ap.parse_args()
    modes = args.modes.split(",")

    import jax
    import jax.numpy as jnp

    from diffcloth_tpu.core import selfcol as sc
    from diffcloth_tpu.core import selfcol_pallas as scp
    from diffcloth_tpu.core import sparse_ops as spo
    from diffcloth_tpu.core import contact as ct
    from diffcloth_tpu.core.sim import ClothSim
    from diffcloth_tpu.geometry import builder as gb
    from diffcloth_tpu.tasks.registry import DRESS_SCENE

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    t0 = time.time()
    scene = gb.build_scene(DRESS_SCENE)
    sim = ClothSim(scene)
    print(f"sim built in {time.time() - t0:.0f}s n={sim.n} "
          f"method={getattr(sim.self_cfg, 'method', None)} "
          f"solve={sim.solve_mode} dense_ops={sim.dense is not None}",
          flush=True)
    base = sim.default_params()
    p_inv = sim.p_inv(base)
    x = base.x0
    v = jnp.zeros_like(x)
    cfg = sim.self_cfg
    out = {"n": sim.n}

    if "detect" in modes and cfg is not None:
        f = jax.jit(lambda xb, vb: scp.detect_tables_pallas(
            cfg.allowed, sim.scene_dev.radii, xb, vb, sim.h,
            cfg.k_partners, cfg.max_layers)[0].partner.sum())
        out["ms_detect"] = round(timeit(f, x, v), 2)
        print(json.dumps({"ms_detect": out["ms_detect"]}), flush=True)

    if "solve" in modes:
        f = jax.jit(lambda b: jnp.matmul(
            p_inv, b, precision=jax.lax.Precision.HIGHEST))
        out["ms_solve"] = round(timeit(f, x), 2)
        print(json.dumps({"ms_solve": out["ms_solve"]}), flush=True)

    sp = sim.sparse
    if sp is not None and "applyA" in modes:
        f = jax.jit(lambda xb: sum(y.sum() for y in spo.apply_A(sp, xb)))
        out["ms_applyA"] = round(timeit(f, x), 2)
        print(json.dumps({"ms_applyA": out["ms_applyA"]}), flush=True)

    if sp is not None and "applyAtA" in modes:
        f = jax.jit(lambda vb: spo.apply_AtA(sp, base.k_pertype, vb).sum())
        out["ms_applyAtA"] = round(timeit(f, v + 0.01), 2)
        print(json.dumps({"ms_applyAtA": out["ms_applyAtA"]}), flush=True)

    if sp is not None and "proj" in modes:
        xf = sim.stage_dev.fixed_pos_rest.astype(sim.dtype)
        f = jax.jit(lambda xb: sum(
            p.sum() for p in spo.projections(sp, sim.scene_dev, xb, xf)))
        out["ms_proj"] = round(timeit(f, x), 2)
        print(json.dumps({"ms_proj": out["ms_proj"]}), flush=True)

    if "friction" in modes and cfg is not None:
        tab, _ = jax.jit(lambda xb, vb: scp.detect_tables_pallas(
            cfg.allowed, sim.scene_dev.radii, xb, vb, sim.h,
            cfg.k_partners, cfg.max_layers))(x, v)
        m = base.density * sim.scene_dev.area
        ff = jax.jit(lambda fb: sc.self_friction_tables(
            fb, tab, m, jnp.zeros_like(fb), cfg.max_layers,
            ct.dry_friction_force, differentiable=True).sum())
        out["ms_friction16"] = round(timeit(ff, x * 0.01), 2)
        print(json.dumps({"ms_friction16": out["ms_friction16"]}), flush=True)

    if "step" in modes:
        xfrow = sim.x_fixed_seq(base)[0]
        f = jax.jit(lambda xb, vb: sim.step(
            xb, vb, base, xfrow, p_inv, jnp.asarray(sim.h, sim.dtype),
            jnp.asarray(1.0, sim.dtype))[0].sum())
        t0 = time.time()
        r = f(x, v)
        jax.block_until_ready(r)
        out["s_step_compile"] = round(time.time() - t0, 1)
        out["ms_step"] = round(timeit(f, x, v, n_calls=5), 2)
        print(json.dumps({"ms_step": out["ms_step"],
                          "s_step_compile": out["s_step_compile"]}),
              flush=True)

    print("RESULTS", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
