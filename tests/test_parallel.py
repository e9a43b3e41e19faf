"""Device-mesh parallelism (parallel/mesh.py) on the virtual 8-device CPU
mesh (conftest): dp-sharded batched episode gradients must match the
unsharded vmap exactly, and the tp row-sharded P^{-1} solve must reproduce
the dense solve.

The reference has no scale-out analog (single-process OpenMP, SURVEY §2.7);
these are TPU-native deliverables validated without real multi-chip
hardware.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from diffcloth_tpu import losses
from diffcloth_tpu.config import (AttachmentConfig, FabricConfig, LossType,
                                  SceneConfig, WindConfig)
from diffcloth_tpu.core.sim import ClothSim
from diffcloth_tpu.geometry import builder as gb
from diffcloth_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def tiny_sim():
    cfg = SceneConfig(
        fabric=FabricConfig(cloth_dim_x=2, cloth_dim_y=2,
                            k_stiff_stretching=300, k_stiff_bending=0.05,
                            grid_num_x=4, grid_num_y=4, density=0.3),
        attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
        wind_config=WindConfig.WIND_SIN, time_step=1.0 / 60.0,
        step_num=3, name="tiny")
    return ClothSim(gb.build_scene(cfg), dtype=jnp.float64)


def _population(sim, B):
    base = sim.default_params()
    winds = jnp.asarray(
        np.random.RandomState(0).randn(B, 3) * 0.05, sim.dtype)
    return base, jax.vmap(lambda w: base._replace(wind=w))(winds)


def _loss_fn(sim):
    target = jnp.zeros((sim.n_steps + 1, sim.n, 3), sim.dtype)
    return losses.make_loss_fn(LossType.MATCH_TRAJECTORY,
                               losses.LossInfo(target_x=target))


def test_dp_sharded_vg_matches_unsharded(tiny_sim):
    sim = tiny_sim
    mesh = pmesh.make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    base, params_b = _population(sim, B=8)
    p_inv = sim.p_inv(base)
    loss_fn = _loss_fn(sim)

    fn = pmesh.batched_value_and_grad(sim, loss_fn, mesh)
    losses_sharded, grads_sharded = fn(params_b, p_inv)

    def per_sample(params):
        recs = sim.simulate(params, p_inv, sim.x_fixed_seq(params))
        return loss_fn(recs)

    losses_ref, grads_ref = jax.vmap(jax.value_and_grad(per_sample))(
        params_b)
    g_ref = jax.tree.map(lambda g: jnp.mean(g, axis=0), grads_ref)

    np.testing.assert_allclose(np.asarray(losses_sharded),
                               np.asarray(losses_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(grads_sharded.wind),
                               np.asarray(g_ref.wind), rtol=1e-10)


def test_tp_sharded_solve_matches_dense(tiny_sim):
    """Full dp=2 x tp=2 training step with the row-sharded P^{-1} +
    all_gather solve vs the replicated dense solve."""
    from diffcloth_tpu.core import step as step_mod

    sim = tiny_sim
    mesh = pmesh.make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    base, params_b = _population(sim, B=4)
    p_inv = sim.p_inv(base)
    loss_fn = _loss_fn(sim)

    # reference: dp-only, replicated solve
    fn_ref = pmesh.batched_value_and_grad(
        sim, loss_fn, pmesh.make_mesh(dp=4, tp=1,
                                      devices=jax.devices()[:4]))
    losses_ref, grads_ref = fn_ref(params_b, p_inv)

    # tp-sharded: rebuild the step with the all_gather solve
    sim_tp = ClothSim(sim.scene_host, dtype=jnp.float64)
    sim_tp.step, sim_tp.residual = step_mod.make_step(
        sim_tp.scene_dev, sim_tp.stage_dev, sim_tp.prims, h=sim_tp.h,
        wind_config=sim_tp.cfg.wind_config, flags=sim_tp.flags,
        eps_forward=sim_tp.eps_forward, eps_backward=sim_tp.eps_backward,
        solve_fn=pmesh.make_tp_solve("tp"))
    sim_tp.steps = [sim_tp.step]
    sim_tp.residuals = [sim_tp.residual]
    fn_tp = pmesh.batched_value_and_grad(sim_tp, loss_fn, mesh,
                                         p_inv_spec=P("tp"))
    losses_tp, grads_tp = fn_tp(params_b, p_inv)

    np.testing.assert_allclose(np.asarray(losses_tp),
                               np.asarray(losses_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(grads_tp.wind),
                               np.asarray(grads_ref.wind), rtol=1e-8)
