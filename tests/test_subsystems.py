"""Auxiliary-subsystem tests: export/replay, viewer, checkpoint/resume,
timing, diagnostics (energy + FD oracle), native extension parity.

Mirrors the reference's in-situ guards (SURVEY.md section 4/5): FD-vs-adjoint
agreement, explosion freeze, per-iteration artifact persistence.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcloth_tpu.config import (AttachmentConfig, FabricConfig, LossType,
                                  SceneConfig, WindConfig)
from diffcloth_tpu.core.sim import ClothSim
from diffcloth_tpu.geometry import builder as gb
from diffcloth_tpu import losses


@pytest.fixture(scope="module")
def small():
    cfg = SceneConfig(
        fabric=FabricConfig(cloth_dim_x=2, cloth_dim_y=2,
                            k_stiff_stretching=300, k_stiff_bending=0.05,
                            grid_num_x=5, grid_num_y=5, density=0.3),
        attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
        wind_config=WindConfig.WIND_SIN, time_step=1.0 / 60.0,
        step_num=6, name="subsys")
    scene = gb.build_scene(cfg)
    sim = ClothSim(scene, dtype=jnp.float64)
    params = sim.default_params()._replace(
        wind=jnp.array([0.2, 0.05, 0.1], jnp.float64))
    recs = sim.rollout(params)
    return scene, sim, params, recs


def test_export_import_episode(small, tmp_path):
    scene, sim, params, recs = small
    folder = str(tmp_path / "ep")
    from diffcloth_tpu.io import export_episode, import_episode
    export_episode(folder, recs, scene.tris, stats={"note": "test"})
    xs, tris, info = import_episode(folder)
    assert xs.shape == (sim.n_steps + 1, sim.n, 3)
    np.testing.assert_allclose(xs, np.asarray(recs.full_x()), atol=1e-6)
    np.testing.assert_array_equal(tris, scene.tris)
    assert info["note"] == "test"
    assert len(info["iters"]) == sim.n_steps


def test_viewer_renders(small, tmp_path):
    scene, sim, params, recs = small
    from diffcloth_tpu.io import render_episode, render_frame
    png = str(tmp_path / "f.png")
    render_frame(np.asarray(recs.steps.x[-1]), scene.tris, png)
    assert os.path.getsize(png) > 1000
    gif = str(tmp_path / "ep.gif")
    render_episode(np.asarray(recs.full_x()), scene.tris, gif, stride=3)
    assert os.path.getsize(gif) > 1000


def test_checkpoint_roundtrip(small, tmp_path):
    _, sim, params, _ = small
    from diffcloth_tpu.utils import checkpoint as ckpt
    root = str(tmp_path / "ckpts")
    tree = {"params": params, "step": np.asarray(3)}
    ckpt.save_checkpoint(root, 3, tree, metadata={"demo": "subsys"})
    ckpt.save_checkpoint(root, 7, tree)
    assert ckpt.latest_step(root) == 7
    step, restored = ckpt.restore_checkpoint(root)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored["params"]["wind"]),
                               np.asarray(params.wind))


def test_checkpoint_gc(small, tmp_path):
    from diffcloth_tpu.utils import checkpoint as ckpt
    root = str(tmp_path / "gc")
    for s in range(8):
        ckpt.save_checkpoint(root, s, {"x": np.arange(3.0)}, keep=3)
    steps = sorted(int(f.split("_")[1]) for f in os.listdir(root))
    assert steps == [5, 6, 7]


def test_timer_report():
    import time as _t
    from diffcloth_tpu.utils.timing import Timer
    t = Timer()
    with t.section("forward"):
        with t.section("solve"):
            _t.sleep(0.01)
        with t.section("projection"):
            _t.sleep(0.005)
    rep = t.report("episode")
    assert "forward" in rep and "solve" in rep and "%" in rep
    assert t.sections["forward"].total_s >= 0.015
    assert t.sections["forward/solve"].count == 1


def test_energy_and_explosion(small):
    scene, sim, params, recs = small
    from diffcloth_tpu.core import diagnostics as diag
    m = params.density * sim.scene_dev.area
    x = recs.steps.x[-1]
    s_n = x  # at the fixed point, inertia term vanishes
    e = float(diag.system_energy(sim.scene_dev, sim.stage_dev,
                                 params.k_pertype, m, sim.h, x, s_n,
                                 recs.steps.x_fixed[-1]))
    assert np.isfinite(e) and e >= 0
    assert not bool(diag.is_exploded(x, recs.steps.v[-1]))
    assert bool(diag.is_exploded(x * jnp.nan, recs.steps.v[-1]))


def test_explosion_freeze_in_scan(small):
    """A zero-density parameter produces non-finite accelerations; the
    episode must freeze instead of propagating garbage to every later
    frame (reference Simulation.cpp:1415-1424)."""
    scene, sim, params, _ = small
    bad = params._replace(density=jnp.asarray(0.0, jnp.float64))
    p_inv = sim.p_inv(params)  # valid operator; the forces still explode
    recs = sim.simulate(bad, p_inv, sim.x_fixed_seq(bad))
    x_last = np.asarray(recs.steps.x[-1])
    x_first = np.asarray(recs.steps.x[0])
    # frozen: last frames equal the last finite state (x0 here)
    np.testing.assert_allclose(x_last, x_first)


def test_fd_adjoint_agreement(small):
    """The FD oracle needs tightened solver tolerances and no gradient
    clipping, exactly as the reference tightens forward convergence to 1e-9
    during FD checks (Simulation.cpp:3648,3661)."""
    scene, _, _, _ = small
    from diffcloth_tpu.config import SimFlags
    from diffcloth_tpu.core import diagnostics as diag
    sim = ClothSim(scene, dtype=jnp.float64, eps_forward=1e-11,
                   eps_backward=1e-8,
                   flags=SimFlags(wind_enabled=True, gradient_clipping=False))
    params = sim.default_params()._replace(
        wind=jnp.array([0.2, 0.05, 0.1], jnp.float64))
    info = losses.LossInfo(
        target_x=jnp.zeros((sim.n_steps + 1, sim.n, 3), jnp.float64))
    loss_fn = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    vg = sim.episode_value_and_grad(loss_fn)
    _, grads = vg(params)

    def loss_of(p):
        return vg(p)[0]

    fd = diag.finite_difference_gradients(
        loss_of, params, fields=("wind", "density"), delta=1e-6)
    rep = diag.compare_fd_adjoint(fd, grads, rtol=2e-3)
    for field, (abs_err, rel_err, ok) in rep.items():
        assert ok, f"{field}: abs={abs_err} rel={rel_err}"


def test_spring_constraints_forward_and_grad():
    """Per-edge springs (reference Spring element): forward stays stable
    and dL/dk_spring matches central differences."""
    import dataclasses
    from diffcloth_tpu.config import SimFlags
    cfg = SceneConfig(
        fabric=FabricConfig(cloth_dim_x=2, cloth_dim_y=2,
                            k_stiff_stretching=200, k_stiff_bending=0.05,
                            grid_num_x=4, grid_num_y=4, density=0.3,
                            use_spring_constraints=True),
        attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
        wind_config=WindConfig.WIND_SIN, time_step=1.0 / 60.0,
        step_num=5, forward_convergence_thresh=1e-11,
        backward_convergence_thresh=1e-8, name="springs")
    scene = gb.build_scene(cfg)
    assert len(scene.springs.l0) > 0
    for dense in (True, False):
        sim = ClothSim(scene, dtype=jnp.float64, dense_ops=dense,
                       flags=SimFlags(wind_enabled=True,
                                      gradient_clipping=False))
        params = sim.default_params()._replace(
            wind=jnp.array([0.3, 0.05, 0.1], jnp.float64),
            k_pertype=sim.default_params().k_pertype.at[0].set(50.0))
        recs = sim.rollout(params)
        assert bool(np.all(np.asarray(recs.steps.converged)))
        info = losses.LossInfo(
            target_x=jnp.zeros((sim.n_steps + 1, sim.n, 3), jnp.float64))
        loss_fn = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
        vg = sim.episode_value_and_grad(loss_fn)
        _, grads = vg(params)
        d = 1e-5
        up = params._replace(k_pertype=params.k_pertype.at[0].add(d))
        dn_ = params._replace(k_pertype=params.k_pertype.at[0].add(-d))
        fd = (float(vg(up)[0]) - float(vg(dn_)[0])) / (2 * d)
        ad = float(grads.k_pertype[0])
        assert abs(fd) > 0
        assert np.isclose(fd, ad, rtol=5e-3), (dense, fd, ad)


def test_native_matches_python(small, tmp_path):
    from diffcloth_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    from diffcloth_tpu.native import fastobj as fo
    from diffcloth_tpu.geometry import builder as gbm, objio
    scene, sim, params, recs = small
    p = str(tmp_path / "m.obj")
    x = np.asarray(recs.steps.x[-1])
    fo.save_obj(p, x, scene.tris)
    v1, t1 = fo.load_obj(p)
    v2, t2 = objio.load_obj(p)
    np.testing.assert_allclose(v1, v2)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_allclose(v1, x, atol=1e-7)
    np.testing.assert_array_equal(fo.extract_bending_pairs(scene.tris),
                                  gbm.extract_bending_pairs(scene.tris))
    np.testing.assert_array_equal(
        fo.conn_table(scene.tris, scene.n),
        gbm.adjacency_exclusion(scene.n, scene.tris))


def test_chunked_adjoint_matches_monolithic(small):
    """episode_value_and_grad_chunked must be numerically identical to the
    monolithic gradient (same custom-VJP step; chain rule associates over
    chunks).  This is the long-horizon path OptimizeHelper auto-selects."""
    scene, _, _, _ = small
    sim = ClothSim(scene, dtype=jnp.float64)
    params = sim.default_params()._replace(
        wind=jnp.array([0.25, 0.04, 0.12], jnp.float64))
    info = losses.LossInfo(
        target_x=jnp.zeros((sim.n_steps + 1, sim.n, 3), jnp.float64))
    loss_fn = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    L1, g1 = sim.episode_value_and_grad(loss_fn)(params)
    L2, g2 = sim.episode_value_and_grad_chunked(loss_fn, chunk=2)(params)
    assert np.isclose(float(L1), float(L2), rtol=1e-12)
    for field in ("wind", "wind_freq", "k_pertype", "density", "x0", "v0",
                  "spline"):
        a = np.asarray(getattr(g1, field))
        b = np.asarray(getattr(g2, field))
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12,
                                   err_msg=field)


def test_chunked_forward_matches_simulate(small):
    """rollout_chunked / episode_loss_chunked reproduce simulate()'s
    trajectory, solver stats, and loss exactly (shared step; the chunk
    boundary is associativity only)."""
    scene, sim, params, recs = small
    recs_c = sim.rollout_chunked(params, chunk=2)
    np.testing.assert_allclose(np.asarray(recs_c.steps.x),
                               np.asarray(recs.steps.x), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(recs_c.steps.converged),
                                  np.asarray(recs.steps.converged))
    np.testing.assert_array_equal(np.asarray(recs_c.steps.iters),
                                  np.asarray(recs.steps.iters))
    info = losses.LossInfo(
        target_x=jnp.zeros((sim.n_steps + 1, sim.n, 3), jnp.float64))
    loss_fn = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    L_mono = float(loss_fn(recs))
    L_chunk = float(sim.episode_loss_chunked(loss_fn, chunk=2)(params))
    assert np.isclose(L_mono, L_chunk, rtol=1e-12)


def test_chunked_explosion_freeze_parity(small):
    """The chunked forward must freeze blow-ups exactly like simulate():
    the frozen flag is threaded through chunk boundaries, so loss() and
    loss_and_grad() agree for exploding parameter guesses (ADVICE r2)."""
    scene, sim, params, _ = small
    bad = params._replace(density=jnp.asarray(0.0, jnp.float64))
    p_inv = sim.p_inv(params)  # valid operator; the forces still explode
    recs_mono = sim.simulate(bad, p_inv, sim.x_fixed_seq(bad))
    xfs = sim.x_fixed_seq(bad)
    X, V, stats, _ = sim._chunk_forward(bad, p_inv, xfs, chunk=2)
    np.testing.assert_allclose(np.asarray(X),
                               np.asarray(recs_mono.steps.x), rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(X)))
    # gradient path: finite loss on the frozen rollout, finite gradients
    info = losses.LossInfo(
        target_x=jnp.zeros((sim.n_steps + 1, sim.n, 3), jnp.float64))
    loss_fn = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    vg = sim.episode_value_and_grad_chunked(loss_fn, chunk=2)
    L, g = vg(bad)
    assert np.isfinite(float(L))
    assert np.all(np.isfinite(np.asarray(g.wind)))
