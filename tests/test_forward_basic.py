"""Forward-simulation sanity: PD convergence, energy behavior, invariants.

These mirror the reference's in-situ oracles (SURVEY.md §4): PD
convergence/energy sanity and NaN/explosion guards.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcloth_tpu.config import (FabricConfig, SceneConfig, SimFlags,
                                  AttachmentConfig, TrajectoryConfig,
                                  PrimitiveConfig, WindConfig, Orientation)
from diffcloth_tpu.core.sim import ClothSim
from diffcloth_tpu.geometry import builder as gb


def small_wind_scene(grid=5, steps=10):
    fab = FabricConfig(cloth_dim_x=2.0, cloth_dim_y=2.0,
                       k_stiff_stretching=250.0, k_stiff_bending=0.05,
                       grid_num_x=grid, grid_num_y=grid, density=0.324)
    return SceneConfig(
        fabric=fab,
        attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
        trajectory=TrajectoryConfig.NO_TRAJECTORY,
        primitive_config=PrimitiveConfig.NONE,
        wind_config=WindConfig.WIND_SIN,
        time_step=1.0 / 60.0, step_num=steps,
        forward_convergence_thresh=1e-9, name="test_wind")


@pytest.fixture(scope="module")
def sim():
    scene = gb.build_scene(small_wind_scene())
    return ClothSim(scene, dtype=jnp.float64)


def test_scene_build(sim):
    s = sim.scene_host
    assert s.n == 25
    assert len(s.tris) == 2 * 4 * 4
    # every interior shared edge produced one bending constraint
    assert len(s.bending.n_rest) > 0
    # lumped areas sum to total rest area
    np.testing.assert_allclose(s.area.sum(), s.triangle.area.sum(), rtol=1e-12)
    # two corner attachments
    assert list(s.stages[0].particle_idx) == [0, 4]


def test_forward_converges_and_is_stable(sim):
    params = sim.default_params()
    params = params._replace(wind=jnp.array([0.3, 0.05, 0.3]))
    recs = sim.rollout(params)
    assert recs.steps.x.shape == (10, 25, 3)
    assert np.all(np.isfinite(np.asarray(recs.steps.x)))
    # every step converged within the iteration cap
    assert bool(np.all(np.asarray(recs.steps.converged)))
    # attachment constraint holds: clipped vertices stay near their clips
    clip_err = np.linalg.norm(
        np.asarray(recs.steps.x[-1][sim.stage_host.particle_idx]) -
        np.asarray(recs.steps.x_fixed[-1]))
    assert clip_err < 0.1
    # cloth should not blow up: deformation ratio stays near 1
    assert float(recs.steps.avg_deformation[-1]) < 1.5


def test_hanging_cloth_comes_to_rest(sim):
    """With no wind, a pinned cloth must approach an equilibrium: velocity
    norms decay over the horizon."""
    params = sim.default_params()
    scene = gb.build_scene(small_wind_scene(steps=60))
    sim2 = ClothSim(scene, dtype=jnp.float64,
                    flags=SimFlags(wind_enabled=False))
    p = sim2.default_params()
    recs = sim2.rollout(p)
    v_early = float(jnp.linalg.norm(recs.steps.v[5]))
    v_late = float(jnp.linalg.norm(recs.steps.v[-1]))
    assert v_late < v_early


def test_determinism(sim):
    params = sim.default_params()
    r1 = sim.rollout(params)
    r2 = sim.rollout(params)
    np.testing.assert_array_equal(np.asarray(r1.steps.x),
                                  np.asarray(r2.steps.x))
