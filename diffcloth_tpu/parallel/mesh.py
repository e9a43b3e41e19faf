"""Device-mesh scaling: batch-of-rollouts data parallelism + row-sharded
tensor parallelism for the PD solve.

The reference is single-process OpenMP (SURVEY §2.7); parallel scale-out is a
first-class TPU-native deliverable here:

  * **dp** — thousands of vmapped rollouts sharded over the mesh; episode
    loss/gradients reduced with `psum` over dp to feed a replicated L-BFGS-B
    update (the "batch of perturbed rollouts" north star).
  * **tp** — for large meshes (dress ~7k vertices) the (n,n) P^{-1} matmul
    dominates; its rows shard over tp and the solution is re-assembled with
    an `all_gather` riding ICI.  Everything else (projections, scatter-adds)
    is O(n) and computed replicated.

Multi-host extends the same mesh over DCN: `jax.distributed.initialize()` per
host, then `jax.make_mesh` spans all processes' devices.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host runtime bring-up (call once per host before device use)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    """2-D (dp, tp) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if dp is None:
        dp = len(devices) // tp
    assert dp * tp == len(devices), (dp, tp, len(devices))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def make_tp_solve(axis_name: str = "tp"):
    """Row-sharded P^{-1} apply: each device multiplies its (n/tp, n) block
    and the full (n,3) solution is all-gathered over ICI."""

    def solve(p_inv_block, rhs):
        local = jnp.matmul(p_inv_block, rhs,
                           precision=jax.lax.Precision.HIGHEST)
        return jax.lax.all_gather(local, axis_name, axis=0, tiled=True)

    return solve


def shard_rollout_batch(mesh: Mesh, batch_pytree):
    """Place a batch-leading pytree so the batch axis shards over dp and
    everything else is replicated."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree.map(
        lambda a: jax.device_put(a, sharding), batch_pytree)


def batched_value_and_grad(sim, loss_fn, mesh: Mesh,
                           reduce_grads: bool = True,
                           p_inv_spec: P = P()):
    """Data-parallel episode objective over a population of parameter
    pytrees whose leading axis shards over dp.

    Returns fn(params_batch, p_inv) -> (losses (B,), grads).
    With reduce_grads=True the gradient is psum-averaged over the whole
    batch — the distributed L-BFGS gradient (SURVEY §2.7); otherwise
    per-sample gradients are returned sharded.

    `p_inv_spec=P("tp")` row-shards the prefactorized P^{-1} over the tp
    axis — pair it with a sim whose step was built with
    `solve_fn=make_tp_solve("tp")` so the solve all-gathers the sharded
    block product (the full dp x tp training step; __graft_entry__'s
    dryrun_multichip is the reference caller)."""
    from jax import shard_map

    def per_sample(params, p_inv):
        recs = sim.simulate(params, p_inv, sim.x_fixed_seq(params))
        return loss_fn(recs)

    def local_block(params_block, p_inv):
        losses, grads = jax.vmap(
            jax.value_and_grad(per_sample), in_axes=(0, None))(
                params_block, p_inv)
        if reduce_grads:
            grads = jax.tree.map(lambda g: jnp.mean(g, axis=0), grads)
            grads = jax.lax.pmean(grads, "dp")
        return losses, grads

    fn = shard_map(
        local_block, mesh=mesh,
        in_specs=(P("dp"), p_inv_spec),
        out_specs=(P("dp"), P() if reduce_grads else P("dp")),
        check_vma=False)
    return jax.jit(fn)
