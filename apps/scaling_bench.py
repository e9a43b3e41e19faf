"""Scaling-efficiency harness: batched rollouts over a (dp, tp) device mesh.

Measures aggregate PD steps/s with the rollout population sharded over dp at
1 device vs all devices, and reports scaling efficiency
(BASELINE.md north star: >= 80% at 2+ hosts).  On real hardware run one
process per host after `jax.distributed.initialize` (parallel/mesh.py
initialize_distributed); on a dev machine use virtual CPU devices:

  python apps/scaling_bench.py --devices 8 --batch-per-device 4 --steps 20

The forward chunk executed per device call is identical to bench.py's; the
only difference is `shard_map` over dp instead of plain vmap.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n_devices: int, batch_per_device: int, steps: int, tiny: bool):
    import jax
    if jax.default_backend() != "tpu" and len(jax.devices()) < n_devices:
        raise SystemExit(
            f"need {n_devices} devices; on CPU set jax_num_cpu_devices "
            "before backend init (this script does it with --devices)")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    import __graft_entry__ as em
    from diffcloth_tpu.parallel import mesh as pmesh

    sim = em._flagship_sim(tiny=tiny)
    steps = min(steps, sim.n_steps)
    base = sim.default_params()._replace(
        wind=jnp.array([0.04, 0.004, 0.04], sim.dtype))
    p_inv = sim.p_inv(base)
    xfs = sim.x_fixed_seq(base)[:steps]
    idx_f = jnp.arange(1, steps + 1, dtype=sim.dtype)
    h = jnp.asarray(sim.h, sim.dtype)

    def rollout(wind, x, v):
        params = base._replace(wind=wind)

        def body(carry, inp):
            x, v = carry
            xf, i = inp
            x2, v2, aux = sim.step(x, v, params, xf, p_inv, i * h, i)
            return (x2, v2), aux.iters

        (x, v), iters = jax.lax.scan(body, (x, v), (xfs, idx_f))
        return x, jnp.sum(iters)

    def measure(devs):
        mesh = pmesh.make_mesh(dp=len(devs), tp=1, devices=devs)
        B = batch_per_device * len(devs)
        winds = jnp.asarray(
            np.random.RandomState(0).randn(B, 3) * 0.02 +
            np.asarray([0.04, 0.004, 0.04]), sim.dtype)
        x0 = jnp.broadcast_to(base.x0, (B,) + base.x0.shape)
        v0 = jnp.broadcast_to(base.v0, (B,) + base.v0.shape)

        fn = jax.jit(shard_map(
            jax.vmap(rollout), mesh=mesh,
            in_specs=(P("dp"), P("dp"), P("dp")), out_specs=(P("dp"), P("dp")),
            check_rep=False))
        out = jax.block_until_ready(fn(winds, x0, v0))  # compile
        t0 = time.time()
        out = jax.block_until_ready(fn(winds, x0, v0))
        dt = time.time() - t0
        return B * steps / dt

    devs = jax.devices()[:n_devices]
    sps_1 = measure(devs[:1])
    sps_n = measure(devs)
    eff = sps_n / (sps_1 * n_devices)
    print(json.dumps({
        "metric": "dp_scaling_efficiency",
        "devices": n_devices,
        "steps_per_sec_1dev": round(sps_1, 1),
        "steps_per_sec_ndev": round(sps_n, 1),
        "efficiency": round(eff, 3),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch-per-device", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--full-mesh", action="store_true",
                    help="use the tshirt1000 mesh instead of the tiny grid")
    ap.add_argument("--tpu", action="store_true",
                    help="use the real TPU devices (default: virtual CPU "
                         "mesh, which validates the sharded program)")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        # virtual CPU devices — must be set before backend init
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    run(args.devices, args.batch_per_device, args.steps,
        tiny=not args.full_mesh)


if __name__ == "__main__":
    main()
