"""Adjoint-cap sweep on the real chip: batched episode value_and_grad
throughput at several backward fixed-point caps, plus gradient agreement
vs the reference cap (400, Simulation.cpp:1561).

Usage: python tools/adjoint_probe.py [--caps 400,64,40,24] [--B 64]
Writes output/adjoint_probe_r5.json.
"""
import argparse, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", default="400,64,40,24")
    ap.add_argument("--B", type=int, default=64)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from diffcloth_tpu import losses
    from diffcloth_tpu.config import LossType, SimFlags
    from diffcloth_tpu.core.sim import ClothSim
    from diffcloth_tpu.geometry import builder as gb
    from diffcloth_tpu.tasks.registry import TSHIRT_SCENE
    from bench import CHUNK

    print("backend:", jax.default_backend(), flush=True)
    scene = gb.build_scene(TSHIRT_SCENE)
    B = args.B
    results = {}
    ref_grad = None
    for cap in [int(c) for c in args.caps.split(",")]:
        sim = ClothSim(scene, flags=SimFlags(wind_enabled=True,
                                             max_backward_iters=cap))
        base = sim.default_params()
        target = jnp.zeros((sim.n_steps + 1, sim.n, 3), jnp.float32)
        loss_fn = losses.make_loss_fn(
            LossType.MATCH_TRAJECTORY, losses.LossInfo(target_x=target))
        vg = sim.episode_value_and_grad_chunked(loss_fn, chunk=CHUNK,
                                                batched=True)
        winds = jnp.asarray(
            np.random.RandomState(1).randn(B, 3) * 0.02 +
            np.array([0.04, 0.004, 0.04]), jnp.float32)
        pb = jax.vmap(lambda w: base._replace(wind=w))(winds)
        t0 = time.time()
        L, g = vg(pb)
        jax.block_until_ready(L)
        print(f"cap {cap}: compile+first {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        L, g = vg(pb)
        jax.block_until_ready(L)
        dt = time.time() - t0
        sps = B * sim.n_steps / dt
        row = {"steps_per_sec": round(sps, 1),
               "loss_mean": float(np.mean(np.asarray(L)))}
        gsel = {k: np.asarray(getattr(g, k))
                for k in ("wind", "k_pertype", "density", "x0")}
        if ref_grad is None:
            ref_grad = gsel
        else:
            for k, a in gsel.items():
                r = ref_grad[k]
                rel = float(np.linalg.norm(a - r) /
                            max(np.linalg.norm(r), 1e-12))
                cos = float(np.sum(a * r) /
                            max(np.linalg.norm(a) * np.linalg.norm(r),
                                1e-30))
                row[f"relerr_{k}"] = round(rel, 6)
                row[f"cos_{k}"] = round(cos, 8)
        results[str(cap)] = row
        print(f"cap {cap}: {sps:.1f} ep-grad steps/s  {row}", flush=True)
    os.makedirs("output", exist_ok=True)
    with open("output/adjoint_probe_r5.json", "w") as f:
        json.dump(results, f, indent=1)
    print("saved output/adjoint_probe_r5.json", flush=True)


if __name__ == "__main__":
    main()
