"""On-chip self-collision detector experiment (VERDICT r2 #1/#7).

Measures, on the real TPU chip, for the tshirt flagship scene:
  1. single-state detection parity: pallas vs matrix pair sets
  2. vmapped detection parity at B>=32 (pallas vs matrix per sample)
  3. chunked batched-rollout throughput at several batch sizes per
     detection method (matrix / pallas / sweep) — the round-2 headline
     bench crashed with the matrix detector at B=256; this isolates
     whether that was detector HBM pressure or chip contention.

Usage: python tools/detect_experiment.py [--methods m1,m2] [--skip-parity] [B ...]

NOTE a crashed TPU worker poisons the whole process (every later device
call fails UNAVAILABLE) — run each risky method/batch combination in its
own process.  Observed on chip (2026-08-20): sweep at B=256 crashes the
worker (vmapped sorts serialize into minute-long single executions, which
the remote transport kills); matrix at B=256 is the round-2 HBM blow-up.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pairset(cs, n):
    """Canonical set of active pairs from a SelfContactSet."""
    m = np.asarray(cs.mask)
    i = np.asarray(cs.pair_i)[m]
    j = np.asarray(cs.pair_j)[m]
    return set(map(tuple, np.stack([np.minimum(i, j),
                                    np.maximum(i, j)], axis=1).tolist()))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("batches", nargs="*", type=int, default=None)
    ap.add_argument("--methods", default="matrix,pallas,sweep")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as entrymod
    from diffcloth_tpu.core import selfcol as sc
    from diffcloth_tpu.core import selfcol_pallas as scp

    batches = args.batches or [64, 256]
    methods = args.methods.split(",")
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    from diffcloth_tpu.core.sim import ClothSim
    from diffcloth_tpu.geometry import builder as gb
    from diffcloth_tpu.tasks.registry import TSHIRT_SCENE

    scene0 = gb.build_scene(TSHIRT_SCENE)
    sims = {}
    for method in dict.fromkeys(["matrix"] * (not args.skip_parity)
                                + methods):
        t0 = time.time()
        sims[method] = ClothSim(scene0, self_method=method)
        print(f"built sim[{method}] in {time.time() - t0:.1f}s", flush=True)

    sim = sims.get("matrix") or sims[methods[0]]
    n = sim.n
    scene = sim.scene_host
    radii = sim.scene_dev.radii
    h = sim.h

    # --- squashed state with real self-contacts ---------------------------
    # pick the mildest y-squash giving a healthy contact count WITHOUT
    # overflow (overflowing detectors keep method-dependent subsets, so
    # pair sets are only comparable below capacity)
    x0 = np.asarray(scene.x_rest, np.float64)
    c = x0.mean(axis=0)
    allowed_tri = np.asarray(
        ~scene.conn_table & ~np.eye(n, dtype=bool) &
        np.triu(np.ones((n, n), bool), 1))
    cap = max(128, n // 2)
    K = 6

    det_m = jax.jit(lambda x, v: sc.detect_self_collisions_matrix(
        jnp.asarray(allowed_tri), radii, x, v, h, K, cap))
    allowed_pal = jnp.asarray(scp.pack_allowed(allowed_tri))
    det_p = jax.jit(lambda x, v: scp.detect_self_collisions_pallas(
        allowed_pal, radii, x, v, h, K, cap))

    chosen = None
    for s in () if args.skip_parity else \
            (0.6, 0.45, 0.35, 0.28, 0.22, 0.17, 0.13, 0.1, 0.07, 0.05):
        xsq = (x0 - c) * np.array([1.0, s, 1.0]) + c
        x_dev = jnp.asarray(xsq, jnp.float32)
        v_dev = jnp.zeros_like(x_dev)
        cs = det_m(x_dev, v_dev)
        n_hit = int(np.asarray(cs.mask).sum())
        ovf = bool(cs.overflow)
        print(f"scale {s}: hits={n_hit} overflow={ovf}", flush=True)
        if not ovf and 20 <= n_hit <= cap // 2:
            chosen = s
            break
    assert args.skip_parity or chosen is not None, \
        "no squash scale gave a clean contact set"

    if not args.skip_parity:
        cs_m = det_m(x_dev, v_dev)
        cs_p = det_p(x_dev, v_dev)
        pm, pp = pairset(cs_m, n), pairset(cs_p, n)
        print(f"single-state (scale {chosen}): matrix pairs={len(pm)} "
              f"pallas pairs={len(pp)} overflow m={bool(cs_m.overflow)} "
              f"p={bool(cs_p.overflow)} equal={pm == pp}", flush=True)
        assert pm == pp, (len(pm), len(pp), list(pm ^ pp)[:10])
        assert len(pm) > 0, "squash produced no contacts — test is vacuous"

        # --- vmap parity at B=32 -------------------------------------------
        B = 32
        rng = np.random.RandomState(0)
        scales = chosen * (0.9 + 0.4 * rng.rand(B))
        xs = np.stack([(x0 - c) * np.array([1.0, s, 1.0]) + c
                       for s in scales])
        xs_dev = jnp.asarray(xs, jnp.float32)
        vs_dev = jnp.zeros_like(xs_dev)
        t0 = time.time()
        csb_m = jax.jit(jax.vmap(det_m))(xs_dev, vs_dev)
        jax.block_until_ready(csb_m.mask)
        t_m = time.time() - t0
        t0 = time.time()
        csb_p = jax.jit(jax.vmap(det_p))(xs_dev, vs_dev)
        jax.block_until_ready(csb_p.mask)
        t_p = time.time() - t0
        n_diff = 0
        for b in range(B):
            sm = pairset(jax.tree.map(lambda a: a[b], csb_m), n)
            sp = pairset(jax.tree.map(lambda a: a[b], csb_p), n)
            if sm != sp:
                n_diff += 1
        print(f"vmap B={B} parity: mismatched samples={n_diff} "
              f"(compile+run matrix {t_m:.1f}s pallas {t_p:.1f}s)",
              flush=True)
        assert n_diff == 0

        # warm detection timing at B=32
        for name, det in (("matrix", det_m), ("pallas", det_p)):
            f = jax.jit(jax.vmap(det))
            f(xs_dev, vs_dev).mask.block_until_ready()
            t0 = time.time()
            for _ in range(10):
                out = f(xs_dev, vs_dev)
            out.mask.block_until_ready()
            print(f"  detection-only B={B} {name}: "
                  f"{(time.time() - t0) / 10 * 1e3:.2f} ms/call", flush=True)

    # --- rollout throughput per method -------------------------------------
    from bench import forward_throughput
    results = {}
    base = sim.default_params()._replace(
        wind=jnp.array([0.04, 0.004, 0.04], jnp.float32),
        wind_freq=jnp.asarray(10.0, jnp.float32),
        wind_phase=jnp.asarray(0.5, jnp.float32))
    for method in methods:
        s = sims[method]
        p_inv = s.p_inv(base)
        xfs = s.x_fixed_seq(base)
        for B in batches:
            key = f"{method}_B{B}"
            try:
                t0 = time.time()
                sps, conv, iters, ips = forward_throughput(
                    s, base, p_inv, xfs, B)
                results[key] = {"steps_per_sec": round(sps, 1),
                                "conv_frac": round(conv, 3),
                                "mean_iters": round(iters, 1),
                                "compile_plus_run_s": round(
                                    time.time() - t0, 1)}
            except Exception as e:
                results[key] = {"error": repr(e)[:300]}
            print(key, "->", json.dumps(results[key]), flush=True)

    print("RESULTS", json.dumps(results))


if __name__ == "__main__":
    main()
