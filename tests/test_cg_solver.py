"""Matrix-free Jacobi-PCG solve path (solve_mode='cg') vs the explicit
dense P^{-1} path — the beyond-dress-scale global solve (SURVEY 7.4-5).

PD tolerates inexact global solves, so trajectories agree to solver
tolerance (not bitwise); the gradient flow (custom-VJP adjoint reusing the
same solve as preconditioner) must stay FD-consistent.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcloth_tpu import losses
from diffcloth_tpu.config import (AttachmentConfig, FabricConfig, LossType,
                                  SceneConfig, WindConfig)
from diffcloth_tpu.core.sim import ClothSim
from diffcloth_tpu.geometry import builder as gb


@pytest.fixture(scope="module")
def scene():
    cfg = SceneConfig(
        fabric=FabricConfig(cloth_dim_x=2, cloth_dim_y=2,
                            k_stiff_stretching=300, k_stiff_bending=0.05,
                            grid_num_x=6, grid_num_y=6, density=0.3),
        attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
        wind_config=WindConfig.WIND_SIN, time_step=1.0 / 60.0,
        step_num=5, name="cgtest")
    return gb.build_scene(cfg)


def _params(sim):
    return sim.default_params()._replace(
        wind=jnp.array([0.2, 0.05, 0.1], jnp.float64))


def test_cg_trajectory_matches_dense(scene):
    sim_d = ClothSim(scene, dtype=jnp.float64)
    sim_c = ClothSim(scene, dtype=jnp.float64, solve_mode="cg",
                     cg_max_iters=200, cg_rtol=1e-12)
    assert sim_d.solve_mode == "dense" and sim_c.solve_mode == "cg"
    # cg's p_inv data is O(n): the Jacobi diagonal
    p = _params(sim_d)
    assert sim_c.p_inv(p).shape == (sim_c.n,)
    r_d = sim_d.rollout(_params(sim_d))
    r_c = sim_c.rollout(_params(sim_c))
    np.testing.assert_allclose(np.asarray(r_c.steps.x),
                               np.asarray(r_d.steps.x),
                               rtol=1e-6, atol=1e-8)
    assert np.all(np.asarray(r_c.steps.converged))


def test_cg_gradients_match_dense(scene):
    sim_d = ClothSim(scene, dtype=jnp.float64)
    sim_c = ClothSim(scene, dtype=jnp.float64, solve_mode="cg",
                     cg_max_iters=200, cg_rtol=1e-12)
    info = losses.LossInfo(
        target_x=jnp.zeros((sim_d.n_steps + 1, sim_d.n, 3), jnp.float64))
    loss_fn = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    L_d, g_d = sim_d.episode_value_and_grad(loss_fn)(_params(sim_d))
    L_c, g_c = sim_c.episode_value_and_grad(loss_fn)(_params(sim_c))
    assert np.isclose(float(L_d), float(L_c), rtol=1e-8)
    for field in ("wind", "k_pertype", "density", "x0", "spline"):
        np.testing.assert_allclose(np.asarray(getattr(g_c, field)),
                                   np.asarray(getattr(g_d, field)),
                                   rtol=1e-4, atol=1e-8, err_msg=field)


def test_cg_chunked_adjoint(scene):
    sim_c = ClothSim(scene, dtype=jnp.float64, solve_mode="cg",
                     cg_max_iters=200, cg_rtol=1e-12)
    info = losses.LossInfo(
        target_x=jnp.zeros((sim_c.n_steps + 1, sim_c.n, 3), jnp.float64))
    loss_fn = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    L1, g1 = sim_c.episode_value_and_grad(loss_fn)(_params(sim_c))
    L2, g2 = sim_c.episode_value_and_grad_chunked(
        loss_fn, chunk=1)(_params(sim_c))
    assert np.isclose(float(L1), float(L2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1.wind), np.asarray(g2.wind),
                               rtol=1e-9)
