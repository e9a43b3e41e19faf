"""Scaling-efficiency harness: batched rollouts AND training steps (episode
value_and_grad + dp gradient reduction) over a (dp, tp) device mesh.

Measures aggregate PD steps/s with the rollout population sharded over dp at
1 device vs all devices, and reports scaling efficiency
(BASELINE.md north star: >= 80% at 2+ hosts).  On real hardware run one
process per host after `jax.distributed.initialize` (parallel/mesh.py
initialize_distributed); on a dev machine use virtual CPU devices:

  python apps/scaling_bench.py --devices 8 --batch-per-device 4 --steps 20 \
      --tp 2 --out SCALING.json

Forward rows shard over dp only; the train-step row exercises dp gradient
pmean TOGETHER with the tp row-sharded PD solve (parallel/mesh.make_tp_solve)
when --tp > 1 — the full distributed-L-BFGS inner loop.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_sim(tiny, tp_axis=None):
    import __graft_entry__ as em
    if isinstance(tiny, int) and not isinstance(tiny, bool):
        # medium grid: large enough that per-device compute dominates
        # dispatch, small enough for a CPU-mesh validation run
        from diffcloth_tpu.config import (AttachmentConfig, FabricConfig,
                                          SceneConfig, WindConfig)
        from diffcloth_tpu.core.sim import ClothSim
        from diffcloth_tpu.geometry import builder as gbm
        cfg = SceneConfig(
            fabric=FabricConfig(cloth_dim_x=4, cloth_dim_y=4,
                                k_stiff_stretching=550,
                                k_stiff_bending=0.01, grid_num_x=tiny,
                                grid_num_y=tiny, density=0.124),
            attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
            wind_config=WindConfig.WIND_SIN, time_step=1.0 / 90.0,
            step_num=60, name=f"grid{tiny}")
        sim = ClothSim(gbm.build_scene(cfg))
    else:
        sim = em._flagship_sim(tiny=tiny)
    if tp_axis:
        from diffcloth_tpu.core import step as step_mod
        from diffcloth_tpu.parallel import mesh as pmesh
        sim.step, sim.residual = step_mod.make_step(
            sim.scene_dev, sim.stage_dev, sim.prims, h=sim.h,
            wind_config=sim.cfg.wind_config, flags=sim.flags,
            eps_forward=sim.eps_forward, eps_backward=sim.eps_backward,
            self_cfg=sim.self_cfg, dense=sim.dense, sparse=sim.sparse,
            solve_fn=pmesh.make_tp_solve(tp_axis))
        sim.steps = [sim.step]
        sim.residuals = [sim.residual]
    return sim


def run(n_devices: int, batch_per_device: int, steps: int, tiny: bool,
        tp: int, out_path: str, note: str = "", repeats: int = 3):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from diffcloth_tpu import losses
    from diffcloth_tpu.config import LossType
    from diffcloth_tpu.parallel import mesh as pmesh

    sim = build_sim(tiny)
    steps = min(steps, sim.n_steps)
    base = sim.default_params()._replace(
        wind=jnp.array([0.04, 0.004, 0.04], sim.dtype))
    p_inv = sim.p_inv(base)
    xfs = sim.x_fixed_seq(base)[:steps]
    idx_f = jnp.arange(1, steps + 1, dtype=sim.dtype)
    h = jnp.asarray(sim.h, sim.dtype)

    def rollout_fn(sim_):
        def rollout(wind, x, v):
            params = base._replace(wind=wind)

            def body(carry, inp):
                x, v = carry
                xf, i = inp
                x2, v2, aux = sim_.step(x, v, params, xf, p_inv, i * h, i)
                return (x2, v2), aux.iters

            (x, v), iters = jax.lax.scan(body, (x, v), (xfs, idx_f))
            return x, jnp.sum(iters)
        return rollout

    def measure_forward(devs):
        mesh = pmesh.make_mesh(dp=len(devs), tp=1, devices=devs)
        B = batch_per_device * len(devs)
        winds = jnp.asarray(
            np.random.RandomState(0).randn(B, 3) * 0.02 +
            np.asarray([0.04, 0.004, 0.04]), sim.dtype)
        x0 = jnp.broadcast_to(base.x0, (B,) + base.x0.shape)
        v0 = jnp.broadcast_to(base.v0, (B,) + base.v0.shape)
        fn = jax.jit(shard_map(
            jax.vmap(rollout_fn(sim)), mesh=mesh,
            in_specs=(P("dp"), P("dp"), P("dp")),
            out_specs=(P("dp"), P("dp")), check_vma=False))
        jax.block_until_ready(fn(winds, x0, v0))  # compile
        best = float("inf")
        for _ in range(repeats):   # best-of-N: 2-core hosts are noisy
            t0 = time.time()
            jax.block_until_ready(fn(winds, x0, v0))
            best = min(best, time.time() - t0)
        return B * steps / best

    def measure_train(devs, tp_):
        """One distributed training step: vmapped episode value_and_grad per
        dp shard, tp-sharded PD solve, pmean gradient reduction over dp."""
        dp = len(devs) // tp_
        mesh = pmesh.make_mesh(dp=dp, tp=tp_, devices=devs)
        sim_tp = build_sim(tiny, tp_axis="tp" if tp_ > 1 else None)
        target = jnp.zeros((steps + 1, sim.n, 3), sim.dtype)
        info = losses.LossInfo(target_x=target)
        loss_fn = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)

        def per_sample_loss(wind, x, v, p_inv_blk):
            params = base._replace(wind=wind)

            def body(carry, inp):
                x, v = carry
                xf, i = inp
                x2, v2, _ = sim_tp.step(x, v, params, xf, p_inv_blk,
                                        i * h, i)
                return (x2, v2), (x2, v2)

            (xN, vN), (X, V) = jax.lax.scan(body, (x, v), (xfs, idx_f))
            from diffcloth_tpu.core.types import EpisodeRecords, StepRecord
            recs = EpisodeRecords(x0=x, v0=v, steps=StepRecord(
                x=X, v=V, f=jnp.zeros_like(X), r=jnp.zeros_like(X),
                x_fixed=jnp.zeros((steps, 0, 3), sim.dtype),
                converged=jnp.ones((steps,), bool),
                iters=jnp.zeros((steps,), jnp.int32),
                avg_deformation=jnp.ones((steps,), sim.dtype),
                max_deformation=jnp.ones((steps,), sim.dtype),
                selfcol_overflow=jnp.zeros((steps,), bool)))
            return loss_fn(recs)

        def train_step(winds, x, v, p_inv_blk):
            ls, gw = jax.vmap(jax.value_and_grad(per_sample_loss),
                              in_axes=(0, 0, 0, None))(winds, x, v,
                                                       p_inv_blk)
            g = jax.lax.pmean(jnp.mean(gw, axis=0), "dp")
            return jax.lax.pmean(jnp.mean(ls), "dp"), g

        B = batch_per_device * dp
        winds = jnp.asarray(
            np.random.RandomState(1).randn(B, 3) * 0.02 +
            np.asarray([0.04, 0.004, 0.04]), sim.dtype)
        x0 = jnp.broadcast_to(base.x0, (B,) + base.x0.shape)
        v0 = jnp.broadcast_to(base.v0, (B,) + base.v0.shape)
        fn = jax.jit(shard_map(
            train_step, mesh=mesh,
            in_specs=(P("dp"), P("dp"), P("dp"), P("tp")),
            out_specs=(P(), P()), check_vma=False))
        L, g = fn(winds, x0, v0, p_inv)
        jax.block_until_ready(L)   # compile
        assert np.isfinite(float(L))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            jax.block_until_ready(fn(winds, x0, v0, p_inv))
            best = min(best, time.time() - t0)
        return B * steps / best

    devs = jax.devices()[:n_devices]
    result = {
        "metric": "scaling_efficiency",
        "devices": n_devices,
        "tp": tp,
        "batch_per_device": batch_per_device,
        "steps": steps,
    }
    if note:
        result["note"] = note
    sps_1 = measure_forward(devs[:1])
    sps_n = measure_forward(devs)
    result["forward_steps_per_sec_1dev"] = round(sps_1, 1)
    result["forward_steps_per_sec_ndev"] = round(sps_n, 1)
    result["forward_efficiency"] = round(sps_n / (sps_1 * n_devices), 3)

    tr_1 = measure_train(devs[:1], 1)
    tr_n = measure_train(devs, tp)
    result["train_steps_per_sec_1dev"] = round(tr_1, 1)
    result["train_steps_per_sec_ndev"] = round(tr_n, 1)
    result["train_efficiency"] = round(
        tr_n * tp / (tr_1 * n_devices), 3)

    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch-per-device", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--tp", type=int, default=2,
                    help="tensor-parallel degree for the train-step row")
    ap.add_argument("--out", default="",
                    help="write the JSON line to this file as well")
    ap.add_argument("--full-mesh", action="store_true",
                    help="use the tshirt1000 mesh instead of the tiny grid")
    ap.add_argument("--grid", type=int, default=0,
                    help="use an NxN grid scene (60-step horizon) instead "
                         "of the tiny 4x4 one — compute-dominated rows on "
                         "a CPU mesh")
    ap.add_argument("--tpu", action="store_true",
                    help="use the real TPU devices (default: virtual CPU "
                         "mesh, which validates the sharded program)")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed repetitions per row (best-of; shared-core "
                         "hosts are noisy)")
    ap.add_argument("--note", default="",
                    help="free-form provenance note recorded in the JSON "
                         "(e.g. physical core count behind a virtual mesh)")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        # virtual CPU devices — must be set before backend init
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    run(args.devices, args.batch_per_device, args.steps,
        tiny=args.grid if args.grid else not args.full_mesh,
        tp=args.tp, out_path=args.out, note=args.note,
        repeats=args.repeats)


if __name__ == "__main__":
    main()
