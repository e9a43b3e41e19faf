"""Scatter-free large-mesh operator path (core/sparse_ops.py): operator
equivalence against the gather/scatter oracle, episode equivalence against
the dense MXU path, and FD gradient parity through the sparse step.

reference: the A / A^T hot loops these operators replace are
Simulation.cpp:1198-1222; the adjoint reuse they must preserve is
Simulation.cpp:1569-1599.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcloth_tpu import losses
from diffcloth_tpu.config import (AttachmentConfig, FabricConfig, LossType,
                                  PrimitiveConfig, SceneConfig, SimFlags,
                                  TrajectoryConfig, WindConfig)
from diffcloth_tpu.core import constraints as cons
from diffcloth_tpu.core import sparse_ops as spo
from diffcloth_tpu.core.sim import ClothSim, scene_to_device, stage_to_device
from diffcloth_tpu.geometry import builder as gb


def make_scene(grid=5):
    fab = FabricConfig(cloth_dim_x=1.5, cloth_dim_y=1.5,
                       k_stiff_stretching=300.0, k_stiff_bending=0.08,
                       grid_num_x=grid, grid_num_y=grid, density=0.3)
    cfg = SceneConfig(
        fabric=fab, attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
        trajectory=TrajectoryConfig.NO_TRAJECTORY,
        primitive_config=PrimitiveConfig.NONE,
        wind_config=WindConfig.WIND_SIN, time_step=1.0 / 60.0, step_num=8,
        forward_convergence_thresh=1e-11,
        backward_convergence_thresh=1e-8, name="sparse-test")
    return gb.build_scene(cfg)


@pytest.fixture(scope="module")
def ops_setup():
    scene = make_scene()
    sp = spo.build_sparse_ops(scene, scene.stages[0], dtype=jnp.float64)
    sdev = scene_to_device(scene, jnp.float64)
    stdev = stage_to_device(scene.stages[0], jnp.float64)
    rng = np.random.RandomState(0)
    x = jnp.asarray(scene.x_rest + 0.05 * rng.randn(scene.n, 3))
    return scene, sp, sdev, stdev, x


def test_apply_A_matches_gather(ops_setup):
    scene, sp, sdev, stdev, x = ops_setup
    ys = spo.apply_A(sp, x)
    ref = (cons.apply_rows(sdev.s_rows_idx, sdev.s_rows_w, x),
           cons.apply_rows(sdev.b_rows_idx, sdev.b_rows_w, x),
           cons.apply_rows(stdev.attach_idx, stdev.attach_w, x),
           cons.apply_rows(sdev.sp_rows_idx, sdev.sp_rows_w, x))
    for got, want in zip(ys, ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-13)


def test_apply_At_and_AtA_match_gather(ops_setup):
    scene, sp, sdev, stdev, x = ops_setup
    k = jnp.array([0.0, 1e4, 300.0, 0.08])
    rng = np.random.RandomState(1)
    ys = spo.apply_A(sp, x)
    ds = tuple(jnp.asarray(rng.randn(*y.shape)) for y in ys)
    got = spo.apply_At(sp, k, *ds)
    want = cons.apply_At_p(sdev, stdev, k, ds[0], ds[1], ds[2], scene.n,
                           p_spring=ds[3])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-11)
    got2 = spo.apply_AtA(sp, k, x)
    want2 = cons.apply_AtA(sdev, stdev, k, x)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=1e-10)


def test_operator_vjps_are_transposes(ops_setup):
    """VJP of A must equal A^T applied weightlessly (and vice versa) —
    the custom VJPs registered to remove scatters must stay consistent."""
    scene, sp, sdev, stdev, x = ops_setup
    rng = np.random.RandomState(2)
    d = jnp.asarray(rng.randn(sp.n_rows[0], 3))
    # <A x, d> == <x, A^T d>
    lhs = jnp.vdot(sp.A_s(x), d)
    rhs = jnp.vdot(x, sp.At_s(d))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)
    # autodiff VJP of A equals At
    _, vjp = jax.vjp(sp.A_s, x)
    np.testing.assert_allclose(np.asarray(vjp(d)[0]),
                               np.asarray(sp.At_s(d)), atol=1e-12)
    # autodiff VJP of At equals A
    _, vjp_t = jax.vjp(sp.At_s, d)
    np.testing.assert_allclose(np.asarray(vjp_t(x)[0]),
                               np.asarray(sp.A_s(x)), atol=1e-12)


@pytest.fixture(scope="module")
def sim_pair():
    scene = make_scene()
    flags = SimFlags(wind_enabled=True, gradient_clipping=False)
    sim_dense = ClothSim(scene, dtype=jnp.float64, flags=flags)
    sim_sparse = ClothSim(scene, dtype=jnp.float64, flags=flags,
                          dense_ops=False, sparse_ops=True)
    assert sim_dense.dense is not None
    assert sim_sparse.sparse is not None and sim_sparse.dense is None
    return sim_dense, sim_sparse


def test_rollout_matches_dense(sim_pair):
    sim_dense, sim_sparse = sim_pair
    p = sim_dense.default_params()._replace(wind=jnp.array([0.3, 0.1, 0.2]))
    rd = sim_dense.rollout(p)
    rs = sim_sparse.rollout(p)
    np.testing.assert_allclose(np.asarray(rs.steps.x),
                               np.asarray(rd.steps.x), atol=1e-9)


def test_episode_gradient_matches_dense_and_fd(sim_pair):
    sim_dense, sim_sparse = sim_pair
    p0 = sim_dense.default_params()._replace(
        wind=jnp.array([0.3, 0.1, 0.2]))
    gt = sim_dense.rollout(p0._replace(wind=jnp.array([0.4, 0.15, 0.25])))
    info = losses.LossInfo(target_x=jax.lax.stop_gradient(gt.full_x()))
    loss_fn = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    Ls, gs = sim_sparse.episode_value_and_grad(loss_fn)(p0)
    Ld, gd = sim_dense.episode_value_and_grad(loss_fn)(p0)
    np.testing.assert_allclose(float(Ls), float(Ld), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(gs.wind), np.asarray(gd.wind),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gs.k_pertype),
                               np.asarray(gd.k_pertype), rtol=1e-6,
                               atol=1e-12)

    # FD check on the sparse path itself (the reference's own oracle,
    # finiteDifferenceBackward, Simulation.cpp:3640-3786)
    def loss_of(params):
        recs = sim_sparse.simulate(params, sim_sparse.p_inv(params),
                                   sim_sparse.x_fixed_seq(params))
        return float(loss_fn(recs))

    delta = 1e-6
    for i in range(3):
        pp = p0._replace(wind=p0.wind.at[i].add(delta))
        pm = p0._replace(wind=p0.wind.at[i].add(-delta))
        fd = (loss_of(pp) - loss_of(pm)) / (2 * delta)
        np.testing.assert_allclose(float(gs.wind[i]), fd, rtol=2e-4,
                                   atol=1e-10)


def test_gmres_cycle_solves():
    """_gmres_cycle must solve a well-conditioned SPD-ish system to high
    accuracy in one m=16 cycle (the adjoint fallback budget)."""
    from diffcloth_tpu.core.step import _gmres_cycle
    rng = np.random.RandomState(3)
    n = 12
    M = rng.randn(n, n) * 0.05 + np.eye(n)
    A = jnp.asarray(M @ M.T)
    b = jnp.asarray(rng.randn(n, 3))
    x = _gmres_cycle(lambda u: A @ u, b, jnp.zeros_like(b), m=16)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-8)


def test_batched_chunked_value_and_grad_matches_per_sample():
    """episode_value_and_grad_chunked(batched=True) — the one-chip
    population gradient used by the backward benchmark and DP training —
    must agree with the per-sample chunked path exactly."""
    import sys
    from diffcloth_tpu.config import LossType
    scene = make_scene()
    flags = SimFlags(wind_enabled=True, gradient_clipping=False)
    sim = ClothSim(scene, dtype=jnp.float64, flags=flags)
    base = sim.default_params()._replace(wind=jnp.array([0.3, 0.1, 0.2]))
    gt = sim.rollout(base._replace(wind=jnp.array([0.4, 0.15, 0.25])))
    info = losses.LossInfo(target_x=jax.lax.stop_gradient(gt.full_x()))
    lf = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    vg1 = sim.episode_value_and_grad_chunked(lf, chunk=4)
    vgB = sim.episode_value_and_grad_chunked(lf, chunk=4, batched=True)
    winds = jnp.asarray(np.random.RandomState(0).randn(3, 3) * 0.1
                        + np.array([0.3, 0.1, 0.2]))
    params_b = jax.vmap(lambda w: base._replace(wind=w))(winds)
    LB, gB = vgB(params_b)
    for b in range(3):
        pb = jax.tree.map(lambda a: a[b], params_b)
        L, g = vg1(pb)
        np.testing.assert_allclose(float(L), float(LB[b]), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g.wind),
                                   np.asarray(gB.wind[b]), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(g.spline),
                                   np.asarray(gB.spline[b]), rtol=1e-9,
                                   atol=1e-14)
