"""Velocity-based vs position-based PD cross-validation.

reference: `testvbased_vs_xbased` (Simulation.cpp:1273-1279) — the cheap
numerical self-check that the velocity-form update

    v_new = P^{-1}(b_tilde + r);  x_new = x_n + h v_new

solves the position-form system

    P x_new = b + h r,   b = h^2 A^T p(x_eval) + M s_n,  P = M + h^2 A^T A.

The two are algebraically identical (b_tilde = (b - P x_n)/h), so at a
strictly-converged f64 step the position-form residual evaluated at x_new
must vanish to solver precision.  This is an INDEPENDENT oracle: P and b
are assembled here from the host-side gram matrices and the plain
gather-path projections, not from the step's operator pipeline.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffcloth_tpu.config import (AttachmentConfig, FabricConfig, GRAVITY,
                                  SceneConfig, SimFlags, WindConfig)
from diffcloth_tpu.core import constraints as cons
from diffcloth_tpu.core import contact as ct
from diffcloth_tpu.core import solver as slv
from diffcloth_tpu.core.sim import ClothSim
from diffcloth_tpu.geometry import builder as gb


def _scene_cfg(n_grid=8):
    return SceneConfig(
        fabric=FabricConfig(cloth_dim_x=2, cloth_dim_y=2,
                            k_stiff_stretching=500, k_stiff_bending=0.02,
                            grid_num_x=n_grid, grid_num_y=n_grid,
                            density=0.3),
        attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
        wind_config=WindConfig.NO_WIND, time_step=1.0 / 90.0,
        step_num=8, forward_convergence_thresh=1e-10, name="xcheck")


def _position_form_residual(sim, scene, params, recs, k):
    """|P x_new - (b + h r)| / |b| at recorded step k (0-based)."""
    h = sim.h
    x_n = np.asarray(recs.steps.x[k - 1] if k > 0 else recs.x0, np.float64)
    v_n = np.asarray(recs.steps.v[k - 1] if k > 0 else recs.v0, np.float64)
    x_new = np.asarray(recs.steps.x[k], np.float64)
    r = np.asarray(recs.steps.r[k], np.float64)
    xf = np.asarray(recs.steps.x_fixed[k], np.float64)

    area = np.asarray(scene.area, np.float64)
    m = float(params.density) * area
    f_ext = np.asarray(GRAVITY, np.float64)[None, :] * m[:, None]
    s_n = x_n + h * v_n + h * h * f_ext / m[:, None]

    # independent assembly: host gram matrices + gather-path projections
    gram = slv.dense_gram_matrices(scene)[0]            # (4, n, n)
    k_t = np.asarray(params.k_pertype, np.float64)
    P = np.diag(m) + h * h * np.tensordot(k_t, gram, axes=1)

    def to64(a):
        a = np.asarray(a)
        return jnp.asarray(a if a.dtype.kind != "f" else
                           a.astype(np.float64))

    sd = jax.tree.map(to64, sim.scene_dev)
    st = jax.tree.map(to64, sim.stage_dev)
    p_s, p_b, p_a, p_sp = cons.all_projections(
        sd, st, jnp.asarray(x_new),
        jnp.asarray(xf[:st.attach_idx.shape[0]]))
    At_p = np.asarray(cons.apply_At_p(
        sd, st, jnp.asarray(k_t), p_s, p_b, p_a, sim.n, p_spring=p_sp),
        np.float64)
    b = h * h * At_p + m[:, None] * s_n
    resid = P @ x_new - (b + h * r)
    return float(np.linalg.norm(resid) / np.linalg.norm(b))


@pytest.mark.parametrize("with_floor", [False, True])
def test_velocity_vs_position_form(with_floor):
    cfg = _scene_cfg()
    scene = gb.build_scene(cfg)
    prims = None
    if with_floor:
        from diffcloth_tpu.tasks.setup import _prim_struct
        lo = float(np.asarray(scene.x_rest)[:, 1].min())
        prims = _prim_struct(
            [dict(kind=ct.P_PLANE, center=(0.0, lo - 0.05, 0.0),
                  normal=(0.0, 1.0, 0.0), mu=0.4)], jnp.float64)
    sim = ClothSim(scene, dtype=jnp.float64, prims=prims,
                   flags=SimFlags(wind_enabled=False,
                                  self_collision_enabled=False))
    params = sim.default_params()
    recs = sim.rollout(params)
    conv = np.asarray(recs.steps.converged)
    assert conv.all(), conv
    for k in (2, sim.n_steps - 1):
        rel = _position_form_residual(sim, scene, params, recs, k)
        # strict f64 convergence at eps=1e-10: the position-form residual
        # evaluated at x_new carries only the last-iterate lag + rounding
        assert rel < 5e-7, (with_floor, k, rel)
