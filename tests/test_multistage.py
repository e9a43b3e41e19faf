"""Multi-stage attachment switching (reference: one `sysMat` per attachment
set with `startFrameNum`, selected per step — Simulation.h:361-405,
Simulation.cpp:1053-1068, createAttachments Simulation.cpp:2258-2405).

TPU-native design under test: the episode is a sequence of `lax.scan`
segments, one per stage, each with its own baked attachment operators and
prefactorized P; gradients chain across segment boundaries by ordinary
reverse-mode composition.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffcloth_tpu.config import (AttachmentConfig, FabricConfig,
                                  PrimitiveConfig, SceneConfig,
                                  TrajectoryConfig, WindConfig)
from diffcloth_tpu.core.sim import ClothSim
from diffcloth_tpu.geometry import builder as gb


def _scene(stages, steps=10, grid=5):
    fab = FabricConfig(cloth_dim_x=2.0, cloth_dim_y=2.0,
                       k_stiff_stretching=250.0, k_stiff_bending=0.05,
                       grid_num_x=grid, grid_num_y=grid, density=0.324)
    return SceneConfig(
        fabric=fab,
        attachment_points=AttachmentConfig.CUSTOM_ARRAY,
        custom_attachment_vertex_idx=stages,
        trajectory=TrajectoryConfig.NO_TRAJECTORY,
        primitive_config=PrimitiveConfig.NONE,
        wind_config=WindConfig.WIND_SIN,
        time_step=1.0 / 60.0, step_num=steps,
        forward_convergence_thresh=1e-9, name="test_multistage")


def _sim(stages, steps=10):
    return ClothSim(gb.build_scene(_scene(stages, steps)), dtype=jnp.float64)


def _windy(sim):
    return sim.default_params()._replace(
        wind=jnp.array([0.3, 0.05, 0.3], jnp.float64))


def test_stage_segments_and_padding():
    # unequal stage sizes exercise the F_max padding
    sim = _sim(((0.0, (0, 4)), (0.5, (20, 24, 22))))
    assert sim.n_stages == 2
    assert sim.max_fixed == 3
    # frames 1..4 run stage 0, frames 5..10 run stage 1 (reference: stage i
    # active iff forwardRecords.size() >= startFrameNum_i, last wins)
    assert sim._segments == [(0, 1, 5), (1, 5, 11)]
    xfs = sim.x_fixed_seq(_windy(sim))
    assert xfs.shape == (10, 3, 3)
    # stage-0 segment rows beyond F_0=2 are zero padding
    np.testing.assert_array_equal(np.asarray(xfs[:4, 2]), 0.0)


def test_attachments_actually_switch():
    sim = _sim(((0.0, (0, 4)), (0.5, (20, 24))))
    params = _windy(sim)
    recs = sim.rollout(params)
    X = np.asarray(recs.steps.x)
    assert np.all(np.isfinite(X))
    assert bool(np.all(np.asarray(recs.steps.converged)))
    rest = np.asarray(sim.scene_host.x_rest)
    # during stage 0, vertices 0 and 4 are clipped at their rest positions
    assert np.linalg.norm(X[3, [0, 4]] - rest[[0, 4]]) < 5e-2
    # after the switch, 20/24 are clipped and 0/4 have been released: by the
    # last frame the wind+gravity have moved the released corners visibly
    # while the newly clipped ones stay put
    assert np.linalg.norm(X[-1, [20, 24]] - rest[[20, 24]]) < 5e-2
    assert np.linalg.norm(X[-1, [0, 4]] - rest[[0, 4]]) > \
        2 * np.linalg.norm(X[-1, [20, 24]] - rest[[20, 24]])


def test_prefix_matches_single_stage():
    """Frames before the switch must be bitwise-independent of the later
    stage: a single-stage sim with the same first attachment set over a
    shortened horizon reproduces them."""
    two = _sim(((0.0, (0, 4)), (0.5, (20, 24))), steps=10)
    one = _sim(((0.0, (0, 4)),), steps=4)
    p2 = _windy(two)
    p1 = _windy(one)
    X2 = np.asarray(two.rollout(p2).steps.x)[:4]
    X1 = np.asarray(one.rollout(p1).steps.x)
    np.testing.assert_allclose(X2, X1, rtol=0, atol=1e-12)


def test_gradients_flow_across_the_switch():
    """FD-vs-adjoint on the wind magnitude through both segments: the
    episode gradient must account for stage-0 dynamics influencing the
    stage-1 initial state."""
    sim = _sim(((0.0, (0, 4)), (0.5, (20, 24))))
    params = _windy(sim)

    def loss_fn(recs):
        return jnp.sum(recs.steps.x[-1] ** 2)

    vg = sim.episode_value_and_grad(loss_fn)
    _, g = vg(params)
    g_w = float(g.wind[0])
    assert np.isfinite(g_w) and abs(g_w) > 0

    eps = 1e-6

    def loss_at(w0):
        p = params._replace(wind=params.wind.at[0].set(w0))
        recs = sim.simulate(p, sim.p_inv(p), sim.x_fixed_seq(p))
        return float(loss_fn(recs))

    fd = (loss_at(0.3 + eps) - loss_at(0.3 - eps)) / (2 * eps)
    np.testing.assert_allclose(g_w, fd, rtol=2e-3)


def test_chunked_delegates_for_multistage():
    sim = _sim(((0.0, (0, 4)), (0.5, (20, 24))))
    params = _windy(sim)

    def loss_fn(recs):
        return jnp.sum(recs.steps.x[-1] ** 2)

    L1, g1 = sim.episode_value_and_grad(loss_fn)(params)
    L2, g2 = sim.episode_value_and_grad_chunked(loss_fn, chunk=3)(params)
    assert float(L1) == float(L2)
    np.testing.assert_array_equal(np.asarray(g1.wind), np.asarray(g2.wind))
