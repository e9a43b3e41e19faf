"""Split the full-contact step cost into per-STEP overhead (detection +
geom build + record) and per-ITERATION cost (btilde + friction + solve):
run the production chunked forward at forced PD iteration caps and fit
t(cap) = a + b*cap.

Usage: python tools/step_cost_split.py [--B 64] [--caps 1,6,11]
"""
import argparse, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--caps", default="1,6,11")
    ap.add_argument("--fric-impl", default=None)
    ap.add_argument("--ablate", default="")
    args = ap.parse_args()
    import jax, jax.numpy as jnp
    from diffcloth_tpu.config import SimFlags, WindConfig
    from diffcloth_tpu.core.sim import ClothSim
    from diffcloth_tpu.geometry import builder as gb
    from diffcloth_tpu.tasks.registry import TSHIRT_SCENE

    print("backend:", jax.default_backend(), flush=True)
    scene = gb.build_scene(TSHIRT_SCENE)
    results = {}
    for cap in [int(c) for c in args.caps.split(",")]:
        sim = ClothSim(scene, flags=SimFlags(wind_enabled=True),
                       max_forward_iters=cap, plateau_window=10**6,
                       self_friction_impl=args.fric_impl,
                       self_ablate=args.ablate)
        params = sim.default_params()
        p_inv = sim.p_inv(params)
        xfs = sim.x_fixed_seq(params)
        B = args.B
        pb = jax.tree.map(lambda a: jnp.broadcast_to(a[None],
                                                     (B,) + a.shape),
                          params)
        fwd_jit, _ = sim._chunk_execs(25, batched=True)
        idx_f = jnp.arange(1, 26, dtype=sim.dtype)
        x = pb.x0; v = pb.v0
        frozen = jnp.zeros((B,), bool)
        t0 = time.perf_counter()
        out = fwd_jit(x, v, frozen, pb, p_inv, jnp.broadcast_to(
            xfs[None, :25], (B, 25) + xfs.shape[1:]), idx_f)
        jax.block_until_ready(out)
        print(f"cap {cap}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        out = fwd_jit(x, v, frozen, pb, p_inv, jnp.broadcast_to(
            xfs[None, :25], (B, 25) + xfs.shape[1:]), idx_f)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 25.0 * 1000
        iters = float(np.mean(np.asarray(out[5][1])))
        results[cap] = dt
        print(f"cap {cap}: {dt:.2f} ms/step (mean iters {iters:.1f})",
              flush=True)
    caps = sorted(results)
    if len(caps) >= 2:
        b = (results[caps[-1]] - results[caps[0]]) / (caps[-1] - caps[0])
        a = results[caps[0]] - b * caps[0]
        print(f"fit: per-step overhead {a:.2f} ms + {b:.3f} ms/iteration",
              flush=True)

if __name__ == "__main__":
    main()
