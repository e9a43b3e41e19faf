"""Micro-profile of the layered self-friction application (the r4 finding:
full-contact 380 steps/s vs 5189 with friction ablated — ALL remaining
contact cost is self_friction_tables inside the PD loop).

Times, on chip at B=64 (tshirt scale):
  - one vmapped self_friction_tables call vs populated layer count
    (dynamic while_loop path and static fori path)
  - a single apply_layer equivalent (gather + elementwise) in isolation
  - layer-count statistics over a real wind rollout (what n_layers the
    production loop actually sees per step)

Usage: python tools/friction_profile.py [--B 64]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(f, *args, n_calls=20):
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
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--skip-stats", action="store_true")
    args = ap.parse_args()
    B = args.B

    import jax
    import jax.numpy as jnp

    from diffcloth_tpu.core import contact as ct
    from diffcloth_tpu.core import selfcol as sc
    from diffcloth_tpu.core.sim import ClothSim
    from diffcloth_tpu.geometry import builder as gb
    from diffcloth_tpu.tasks.registry import TSHIRT_SCENE

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scene = gb.build_scene(TSHIRT_SCENE)
    sim = ClothSim(scene)
    n = sim.n
    L = sim.self_cfg.max_layers
    rng = np.random.RandomState(0)

    def synth_tables(n_layers):
        """Random valid partner tables with `n_layers` populated layers
        (each layer a random perfect-ish matching)."""
        partner = np.full((L, n), -1, np.int32)
        normal = np.zeros((L, n, 3), np.float32)
        for l in range(n_layers):
            perm = rng.permutation(n)
            for a, b in zip(perm[0::2], perm[1::2]):
                partner[l, a] = b
                partner[l, b] = a
                d = rng.randn(3).astype(np.float32)
                d /= np.linalg.norm(d)
                normal[l, a] = d
                normal[l, b] = -d
        return sc.SelfContactTables(
            partner=jnp.asarray(partner), normal=jnp.asarray(normal),
            n_layers=jnp.asarray(n_layers, jnp.int32))

    mass = jnp.asarray(rng.rand(n).astype(np.float32) + 0.1)
    f_b = jnp.asarray(rng.randn(B, n, 3).astype(np.float32))
    out = {"B": B, "n": n}

    for nl in (0, 1, 2, 4, 8, 16):
        tab = synth_tables(nl)
        dyn = jax.jit(jax.vmap(lambda fb: sc.self_friction_tables(
            fb, tab, mass, jnp.zeros_like(fb), L,
            ct.dry_friction_force).sum()))
        out[f"ms_while_nl{nl}"] = round(timeit(dyn, f_b), 3)
        print(json.dumps({f"ms_while_nl{nl}": out[f"ms_while_nl{nl}"]}),
              flush=True)
    tab = synth_tables(2)
    sta = jax.jit(jax.vmap(lambda fb: sc.self_friction_tables(
        fb, tab, mass, jnp.zeros_like(fb), L,
        ct.dry_friction_force, differentiable=True).sum()))
    out["ms_fori16_nl2"] = round(timeit(sta, f_b), 3)
    print(json.dumps({"ms_fori16_nl2": out["ms_fori16_nl2"]}), flush=True)

    # isolated gather + elementwise (one apply_layer worth of work)
    p0 = jnp.asarray(synth_tables(1).partner[0])
    nrm0 = jnp.asarray(synth_tables(1).normal[0])

    def one_layer(fb):
        pc = jnp.maximum(p0, 0)
        fhat = fb / mass[:, None]
        d = fhat - fhat[pc]
        k_red = mass * mass[pc] / (mass + mass[pc])
        mu = jnp.full((n,), 0.1, jnp.float32)
        r = k_red[:, None] * ct.dry_friction_force(nrm0, d, mu)
        return jnp.where((p0 >= 0)[:, None], r, 0.0).sum()

    out["ms_one_layer"] = round(timeit(jax.jit(jax.vmap(one_layer)), f_b), 3)
    print(json.dumps({"ms_one_layer": out["ms_one_layer"]}), flush=True)

    if not args.skip_stats:
        # layer counts over a real rollout (B=1, chunked)
        import jax.numpy as jnp
        from diffcloth_tpu.core import selfcol_pallas as scp
        base = sim.default_params()._replace(
            wind=jnp.array([0.04, 0.004, 0.04], jnp.float32),
            wind_freq=jnp.asarray(10.0, jnp.float32),
            wind_phase=jnp.asarray(0.5, jnp.float32))
        recs = sim.rollout_chunked(base, chunk=25)
        X = np.asarray(recs.steps.x)
        V = np.asarray(recs.steps.v)
        cfg = sim.self_cfg
        det = jax.jit(lambda x, v: scp.detect_tables_pallas(
            cfg.allowed, sim.scene_dev.radii, x, v, sim.h,
            cfg.k_partners, cfg.max_layers))
        nls, npairs = [], []
        for k in range(0, sim.n_steps, 5):
            tab, ovf = det(jnp.asarray(X[k]), jnp.asarray(V[k]))
            nls.append(int(tab.n_layers))
            npairs.append(int((np.asarray(tab.partner) >= 0).sum()) // 2)
        out["rollout_n_layers_hist"] = np.bincount(
            nls, minlength=int(L) + 1).tolist()
        out["rollout_pairs_mean"] = round(float(np.mean(npairs)), 1)
        out["rollout_pairs_max"] = int(np.max(npairs))
        print(json.dumps({"n_layers_hist": out["rollout_n_layers_hist"],
                          "pairs_mean": out["rollout_pairs_mean"],
                          "pairs_max": out["rollout_pairs_max"]}), flush=True)

    print("RESULTS", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
