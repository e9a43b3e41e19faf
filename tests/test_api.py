"""API-parity layer: stateful Simulation facade + torch autograd bridge.

The torch bridge is validated against pure-JAX gradients of the same
rollout — the bridge must be a faithful transport, not a new numerical
path.
"""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcloth_tpu.api.pysim import SimulationAPI
from diffcloth_tpu.config import (AttachmentConfig, FabricConfig,
                                  PrimitiveConfig, SceneConfig, SimFlags,
                                  TrajectoryConfig, WindConfig)
from diffcloth_tpu.core.sim import ClothSim
from diffcloth_tpu.geometry import builder as gb


def tiny_task(steps=4):
    fab = FabricConfig(cloth_dim_x=1.5, cloth_dim_y=1.5,
                       k_stiff_stretching=300.0, k_stiff_bending=0.05,
                       grid_num_x=4, grid_num_y=4, density=0.3)
    cfg = SceneConfig(
        fabric=fab, attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
        trajectory=TrajectoryConfig.NO_TRAJECTORY,
        primitive_config=PrimitiveConfig.NONE,
        wind_config=WindConfig.NO_WIND, time_step=1.0 / 60.0,
        step_num=steps, forward_convergence_thresh=1e-10, name="api")
    scene = gb.build_scene(cfg)
    sim = ClothSim(scene, dtype=jnp.float64,
                   flags=SimFlags(wind_enabled=False,
                                  gradient_clipping=False))
    task = types.SimpleNamespace(sim=sim, param_base=sim.default_params())
    return task


@pytest.fixture(scope="module")
def api():
    return SimulationAPI(tiny_task())


def test_step_nn_and_records(api):
    api.reset_system()
    info0 = api.get_state_info()
    assert info0.stepIdx == 0
    a = info0.x_fixedpoints
    info1 = api.step_nn(1, info0.x, info0.v, a)
    assert info1.stepIdx == 1
    assert np.all(np.isfinite(info1.x))
    assert len(api.forward_records) == 2
    # moving the clips drags the attached vertices
    a_moved = a.reshape(-1, 3) + np.array([0.0, 0.5, 0.0])
    info2 = api.step_nn(2, info1.x, info1.v, a_moved.reshape(-1))
    pidx = api.sim.stage_host.particle_idx
    x2 = info2.x.reshape(-1, 3)
    assert x2[pidx][:, 1].mean() > info1.x.reshape(-1, 3)[pidx][:, 1].mean()


def test_step_backward_nn_matches_jax_vjp(api):
    api.reset_system()
    info = api.get_state_info()
    a = info.x_fixedpoints
    rec = api.step_nn(1, info.x, info.v, a)
    gx = np.random.RandomState(0).randn(*rec.x.shape)
    gv = np.zeros_like(rec.v)
    dx, dv, da = api.step_backward_nn(1, info.x, info.v, a, gx, gv)
    assert np.all(np.isfinite(dx)) and np.all(np.isfinite(da))
    assert np.linalg.norm(da) > 0  # clip positions influence the step


def test_torch_bridge_gradients(api):
    torch = pytest.importorskip("torch")
    from diffcloth_tpu.api.torch_bridge import PySim

    api.reset_system()
    sim = api.sim
    info = api.get_state_info()
    module = PySim(api)
    x = torch.tensor(info.x, dtype=torch.float64, requires_grad=True)
    v = torch.tensor(info.v, dtype=torch.float64, requires_grad=True)
    a = torch.tensor(info.x_fixedpoints, dtype=torch.float64,
                     requires_grad=True)
    x1, v1 = module(x, v, a)
    loss = (x1 ** 2).sum()
    loss.backward()
    assert x.grad is not None and torch.isfinite(x.grad).all()
    assert a.grad is not None and torch.isfinite(a.grad).all()

    # pure-JAX reference for the same scalar function
    p = api.params
    p_inv = api._p_inv

    def jax_loss(xj, vj, aj):
        x2, v2, _ = sim.step(xj, vj, p, aj, p_inv,
                             jnp.asarray(sim.h), jnp.asarray(1.0))
        return jnp.sum(x2 ** 2)

    g = jax.grad(jax_loss, argnums=(0, 1, 2))(
        jnp.asarray(info.x.reshape(-1, 3)),
        jnp.asarray(info.v.reshape(-1, 3)),
        jnp.asarray(info.x_fixedpoints.reshape(-1, 3)))
    np.testing.assert_allclose(x.grad.numpy().reshape(-1, 3),
                               np.asarray(g[0]), rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(v.grad.numpy().reshape(-1, 3),
                               np.asarray(g[1]), rtol=1e-6, atol=1e-10)
    # a-grad passes through the reference's norm clamp; compare directions
    ga = np.asarray(g[2]).reshape(-1)
    ta = a.grad.numpy()
    cos = ga @ ta / (np.linalg.norm(ga) * np.linalg.norm(ta))
    assert cos > 0.999999


def test_export_roundtrip(api, tmp_path):
    from diffcloth_tpu.geometry import objio
    api.reset_system()
    info = api.get_state_info()
    api.step_nn(1, info.x, info.v, info.x_fixedpoints)
    path = api.export_current_simulation("roundtrip", str(tmp_path))
    frames = objio.import_frames(path)
    assert frames.shape[0] == 2
    np.testing.assert_allclose(
        frames[-1], np.asarray(api._x), atol=1e-6)
