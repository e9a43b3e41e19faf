"""End-to-end trajectory/parameter optimization: L-BFGS-B system
identification recovers ground-truth parameters.

Mirrors the reference's headline demo semantics (tshirt wind sys-ID: loss
9.52 -> 0.0105 over 18 evaluations, BASELINE.md) at test scale.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcloth_tpu import losses
from diffcloth_tpu.config import (AttachmentConfig, FabricConfig, LossType,
                                  PrimitiveConfig, SceneConfig, SimFlags,
                                  TrajectoryConfig, WindConfig)
from diffcloth_tpu.core.sim import ClothSim
from diffcloth_tpu.geometry import builder as gb
from diffcloth_tpu.optim.helper import GradMask, OptimizeHelper
from diffcloth_tpu.optim.lbfgsb import minimize_lbfgsb


@pytest.fixture(scope="module")
def wind_sysid():
    fab = FabricConfig(cloth_dim_x=2.0, cloth_dim_y=2.0,
                       k_stiff_stretching=300.0, k_stiff_bending=0.05,
                       grid_num_x=5, grid_num_y=5, density=0.3)
    cfg = SceneConfig(
        fabric=fab, attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
        trajectory=TrajectoryConfig.NO_TRAJECTORY,
        primitive_config=PrimitiveConfig.NONE,
        wind_config=WindConfig.WIND_SIN, time_step=1.0 / 60.0, step_num=15,
        forward_convergence_thresh=1e-10, name="sysid")
    scene = gb.build_scene(cfg)
    sim = ClothSim(scene, dtype=jnp.float64,
                   flags=SimFlags(wind_enabled=True, gradient_clipping=False))
    gt_wind = np.array([0.06, 0.01, 0.05])
    p_gt = sim.default_params()._replace(
        wind=jnp.asarray(gt_wind),
        wind_freq=jnp.asarray(10.0), wind_phase=jnp.asarray(0.5))
    gt = sim.rollout(p_gt)
    info = losses.LossInfo(target_x=jax.lax.stop_gradient(gt.full_x()))
    loss_fn = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    return sim, loss_fn, gt_wind, p_gt


def test_lbfgsb_recovers_wind(wind_sysid):
    sim, loss_fn, gt_wind, p_gt = wind_sysid
    mask = GradMask(f_wind=True)
    helper = OptimizeHelper(sim, mask, loss_fn,
                            param_base=p_gt._replace(
                                wind=jnp.zeros(3, jnp.float64)))
    x0 = helper.params_to_vec(helper.base)
    L0, _ = helper.loss_and_grad(x0)
    res = minimize_lbfgsb(helper.loss_and_grad, x0, helper.lower_bound,
                          helper.upper_bound, maxiter=60, ftol=1e-12)
    assert res.loss < 1e-8, f"loss stayed at {res.loss} (init {L0})"
    wind_rec = res.x[0:3]
    np.testing.assert_allclose(wind_rec, gt_wind, atol=2e-3)


def test_param_pack_roundtrip(wind_sysid):
    sim, loss_fn, _, p_gt = wind_sysid
    mask = GradMask(f_wind=True, density=True,
                    k_pertype=(False, False, True, True))
    helper = OptimizeHelper(sim, mask, loss_fn)
    # wind(3) + freq + phase + k_stretch + k_bend + density
    assert helper.n_params == 8
    x = helper.random_param(0)
    params = helper.vec_to_params(x)
    x2 = helper.params_to_vec(params)
    np.testing.assert_allclose(x, x2, rtol=1e-12)
    assert np.all(x >= helper.lower_bound) and np.all(x <= helper.upper_bound)


def test_stiffness_identification(wind_sysid):
    """Recover stretch stiffness from a trajectory — the second tshirt-task
    parameter class (OptimizationTaskSetup.cpp:165-175)."""
    sim, loss_fn, gt_wind, p_gt = wind_sysid
    mask = GradMask(k_pertype=(False, False, True, False))
    helper = OptimizeHelper(
        sim, mask, loss_fn,
        param_base=p_gt._replace(
            k_pertype=p_gt.k_pertype.at[2].set(150.0)))
    x0 = helper.params_to_vec(helper.base)
    res = minimize_lbfgsb(helper.loss_and_grad, x0, helper.lower_bound,
                          helper.upper_bound, maxiter=40, ftol=1e-12)
    assert res.loss < 1e-9
    assert abs(res.x[0] - 300.0) < 2.0, f"k_stretch recovered as {res.x[0]}"


def test_population_lbfgsb_matches_single(wind_sysid):
    """Lockstep multi-start (minimize_lbfgsb_population): every candidate
    follows the same math as the single-instance solver, evaluations ride
    one vmapped batch, and the best endpoint recovers the wind like the
    serial path does."""
    from diffcloth_tpu.optim.lbfgsb import minimize_lbfgsb_population

    sim, loss_fn, gt_wind, p_gt = wind_sysid
    mask = GradMask(f_wind=True)
    helper = OptimizeHelper(sim, mask, loss_fn,
                            param_base=p_gt._replace(
                                wind=jnp.zeros(3, jnp.float64)),
                            chunked=True, chunk=5)
    assert helper.can_batch
    x0 = helper.params_to_vec(helper.base)
    X0 = np.stack([x0, helper.random_param(3), helper.random_param(4)])

    # batched loss agrees with serial loss per candidate
    Lb = helper.batched_loss(X0)
    for i in range(3):
        assert np.isclose(Lb[i], helper.loss(X0[i]), rtol=1e-6), i

    # batched loss_and_grad agrees with the serial objective
    L1, G1 = helper.batched_loss_and_grad(X0)
    for i in range(3):
        l, g = helper.loss_and_grad(X0[i])
        assert np.isclose(L1[i], l, rtol=1e-6)
        np.testing.assert_allclose(G1[i], g, rtol=1e-5, atol=1e-12)

    pop = minimize_lbfgsb_population(
        helper.batched_loss_and_grad, X0, helper.lower_bound,
        helper.upper_bound, maxiter=60, ftol=1e-12)
    assert pop.best.loss < 1e-6, (pop.losses, pop.messages)
    np.testing.assert_allclose(pop.best.x[0:3], gt_wind, atol=5e-3)
