"""Adjoint-vs-finite-difference gradient parity — the reference's own oracle.

reference: `finiteDifferenceBackward` / `calculateFiniteDiffLossArr`
(Simulation.cpp:3587-3786): central differences with delta=1e-6 at tightened
forward convergence, compared against the analytic adjoint per parameter
class.  Here the adjoint is the custom-VJP implicit solve (core/step.py) and
FD uses the same f64 CPU pipeline.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcloth_tpu.config import (AttachmentConfig, FabricConfig,
                                  PrimitiveConfig, SceneConfig, SimFlags,
                                  TrajectoryConfig, WindConfig, SplineType)
from diffcloth_tpu.core.sim import ClothSim
from diffcloth_tpu.geometry import builder as gb
from diffcloth_tpu import losses


def make_sim(steps=6, trajectory=TrajectoryConfig.NO_TRAJECTORY,
             wind=WindConfig.WIND_SIN, grid=4):
    fab = FabricConfig(cloth_dim_x=1.5, cloth_dim_y=1.5,
                       k_stiff_stretching=300.0, k_stiff_bending=0.08,
                       grid_num_x=grid, grid_num_y=grid, density=0.3)
    cfg = SceneConfig(
        fabric=fab, attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
        trajectory=trajectory, primitive_config=PrimitiveConfig.NONE,
        wind_config=wind, time_step=1.0 / 60.0, step_num=steps,
        forward_convergence_thresh=1e-11,
        backward_convergence_thresh=1e-8, name="gradcheck")
    scene = gb.build_scene(cfg)
    # disable clipping so FD and adjoint see the identical objective
    flags = SimFlags(wind_enabled=(wind != WindConfig.NO_WIND),
                     gradient_clipping=False)
    return ClothSim(scene, dtype=jnp.float64, flags=flags,
                    spline_type=SplineType.ENDPOINT_AND_TANGENTS)


def target_records(sim, params):
    """Synthesize a ground-truth trajectory with perturbed params."""
    recs = sim.rollout(params)
    return jax.tree.map(lambda a: jax.lax.stop_gradient(a), recs)


@pytest.fixture(scope="module")
def setup():
    sim = make_sim()
    p_gt = sim.default_params()
    p_gt = p_gt._replace(wind=jnp.array([0.4, 0.1, 0.3]),
                         wind_freq=jnp.asarray(10.0),
                         wind_phase=jnp.asarray(0.5))
    gt = sim.rollout(p_gt)
    from diffcloth_tpu.config import LossType
    info = losses.LossInfo(target_x=jax.lax.stop_gradient(gt.full_x()))
    loss_fn = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    vg = sim.episode_value_and_grad(loss_fn)

    # evaluation point: off-groundtruth guess
    p0 = sim.default_params()
    p0 = p0._replace(wind=jnp.array([0.25, 0.05, 0.2]),
                     wind_freq=jnp.asarray(12.0),
                     wind_phase=jnp.asarray(0.1))

    def loss_of(params):
        p_inv = sim.p_inv(params)
        recs = sim.simulate(params, p_inv, sim.x_fixed_seq(params))
        return float(loss_fn(recs))

    return sim, vg, p0, loss_of


def central_diff(loss_of, params, path, idx, delta):
    def bump(sign):
        leaf = getattr(params, path)
        leaf2 = leaf.at[idx].add(sign * delta) if leaf.ndim else \
            leaf + sign * delta
        return params._replace(**{path: leaf2})
    return (loss_of(bump(+1)) - loss_of(bump(-1))) / (2 * delta)


def check(loss_of, params, grads, path, indices, delta=1e-6, rtol=2e-3,
          atol=1e-10):
    g = getattr(grads, path)
    for idx in indices:
        fd = central_diff(loss_of, params, path, idx, delta)
        ad = float(g[idx]) if g.ndim else float(g)
        assert np.isclose(fd, ad, rtol=rtol, atol=max(atol, 1e-7 * abs(fd))), \
            f"{path}[{idx}]: fd={fd:.10g} adjoint={ad:.10g}"


def test_loss_positive_at_guess(setup):
    sim, vg, p0, loss_of = setup
    L, _ = vg(p0)
    assert float(L) > 0


def test_grad_wind_vector(setup):
    sim, vg, p0, loss_of = setup
    _, g = vg(p0)
    check(loss_of, p0, g, "wind", [(0,), (1,), (2,)], delta=1e-6)


def test_grad_wind_freq_phase(setup):
    sim, vg, p0, loss_of = setup
    _, g = vg(p0)
    check(loss_of, p0, g, "wind_freq", [()], delta=1e-6)
    check(loss_of, p0, g, "wind_phase", [()], delta=1e-6)


def test_grad_stiffness_stretch_bend_attach(setup):
    sim, vg, p0, loss_of = setup
    _, g = vg(p0)
    check(loss_of, p0, g, "k_pertype", [(2,)], delta=1e-4, rtol=5e-3)
    check(loss_of, p0, g, "k_pertype", [(3,)], delta=1e-6, rtol=5e-3)
    check(loss_of, p0, g, "k_pertype", [(1,)], delta=1e-3, rtol=5e-3)


def test_grad_density(setup):
    sim, vg, p0, loss_of = setup
    _, g = vg(p0)
    check(loss_of, p0, g, "density", [()], delta=1e-7, rtol=5e-3)


def test_grad_x0_v0(setup):
    sim, vg, p0, loss_of = setup
    _, g = vg(p0)
    check(loss_of, p0, g, "x0", [(3, 0), (7, 1), (11, 2)], delta=1e-6,
          rtol=5e-3)
    check(loss_of, p0, g, "v0", [(5, 0), (9, 2)], delta=1e-6, rtol=5e-3)


def test_grad_force_field(setup):
    sim = make_sim()
    sim.flags = sim.flags  # force_field needs the flag enabled
    from diffcloth_tpu.config import SimFlags, LossType
    flags = SimFlags(wind_enabled=True, gradient_clipping=False,
                     constant_forcefield_enabled=True)
    sim2 = ClothSim(sim.scene_host, dtype=jnp.float64, flags=flags)
    p_gt = sim2.default_params()._replace(wind=jnp.array([0.4, 0.1, 0.3]))
    gt = sim2.rollout(p_gt)
    info = losses.LossInfo(target_x=jax.lax.stop_gradient(gt.full_x()))
    lf = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    vg = sim2.episode_value_and_grad(lf)
    p0 = sim2.default_params()._replace(wind=jnp.array([0.2, 0.0, 0.1]))

    def loss_of(params):
        recs = sim2.simulate(params, sim2.p_inv(params),
                             sim2.x_fixed_seq(params))
        return float(lf(recs))

    _, g = vg(p0)
    check(loss_of, p0, g, "force_field", [(4, 1), (10, 0)], delta=1e-6,
          rtol=5e-3)


def test_grad_spline_control_points(setup):
    """Spline-parameter gradients through the attachment trajectory
    (reference chain: Simulation.cpp:1642-1670 + Spline.h:284-320)."""
    from diffcloth_tpu.config import LossType
    sim = make_sim(trajectory=TrajectoryConfig.CORNERS_2_UP,
                   wind=WindConfig.NO_WIND)
    p_gt = sim.default_params()
    # move endpoints somewhere definite
    sp = np.array(p_gt.spline)
    sp[:, 1] += 0.5
    p_gt = p_gt._replace(spline=jnp.asarray(sp))
    gt = sim.rollout(p_gt)
    info = losses.LossInfo(target_x=jax.lax.stop_gradient(gt.full_x()))
    lf = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    vg = sim.episode_value_and_grad(lf)
    p0 = sim.default_params()

    def loss_of(params):
        recs = sim.simulate(params, sim.p_inv(params),
                            sim.x_fixed_seq(params))
        return float(lf(recs))

    _, g = vg(p0)
    check(loss_of, p0, g, "spline", [(0, 1), (0, 4), (1, 7)], delta=1e-6,
          rtol=5e-3)


def test_grad_wind_perstep_and_optimizer_slot():
    """Per-step wind factor gradient (reference Simulation.cpp:1722-1730)
    and its OptimizeHelper slot (the reference packs it at
    OptimizeHelper.cpp:190 but never declares bounds — ours does)."""
    from diffcloth_tpu.config import LossType
    from diffcloth_tpu.optim.helper import GradMask, OptimizeHelper

    sim = make_sim(wind=WindConfig.WIND_FACTOR_PER_STEP)
    rng = np.random.RandomState(0)
    p_gt = sim.default_params()._replace(
        wind=jnp.array([0.3, 0.05, 0.2]),
        wind_perstep=jnp.asarray(0.5 + 0.4 * rng.rand(sim.n_steps + 1)))
    gt = sim.rollout(p_gt)
    from diffcloth_tpu.config import LossType
    info = losses.LossInfo(target_x=jax.lax.stop_gradient(gt.full_x()))
    lf = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    vg = sim.episode_value_and_grad(lf)
    p0 = sim.default_params()._replace(wind=jnp.array([0.3, 0.05, 0.2]))

    def loss_of(params):
        recs = sim.simulate(params, sim.p_inv(params),
                            sim.x_fixed_seq(params))
        return float(lf(recs))

    _, g = vg(p0)
    # steps are 1..N so wind_perstep[0] is never read; check interior steps
    check(loss_of, p0, g, "wind_perstep", [(1,), (3,), (6,)], delta=1e-6,
          rtol=5e-3)

    # the optimizer must expose one slot per step factor
    helper = OptimizeHelper(sim, GradMask(wind_perstep=True), lf,
                            param_base=p0, chunked=False)
    assert helper.n_params == sim.n_steps + 1
    x = helper.params_to_vec(p_gt)
    round_trip = helper.vec_to_params(x)
    np.testing.assert_allclose(np.asarray(round_trip.wind_perstep),
                               np.asarray(p_gt.wind_perstep))
    L, gvec = helper.loss_and_grad(helper.params_to_vec(p0))
    np.testing.assert_allclose(gvec[1:7], np.asarray(g.wind_perstep)[1:7],
                               rtol=1e-6)


def test_gmres_fallback_gradient_is_fd_consistent():
    """Force the adjoint fixed point to fail (1 iteration, unreachable
    tolerance) so the GMRES fallback produces EVERY step's adjoint, then
    check the episode gradient against the healthy path and FD.  This is
    the 'fallback fixes, not masks' guarantee (reference analog: the
    direct SparseLU fallback, Simulation.cpp:1590-1594)."""
    from diffcloth_tpu.config import LossType

    fab = FabricConfig(cloth_dim_x=1.5, cloth_dim_y=1.5,
                       k_stiff_stretching=300.0, k_stiff_bending=0.08,
                       grid_num_x=4, grid_num_y=4, density=0.3)

    def build(flags):
        cfg = SceneConfig(
            fabric=fab,
            attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
            trajectory=TrajectoryConfig.NO_TRAJECTORY,
            primitive_config=PrimitiveConfig.NONE,
            wind_config=WindConfig.WIND_SIN, time_step=1.0 / 60.0,
            step_num=6, forward_convergence_thresh=1e-11,
            backward_convergence_thresh=1e-8, name="fallback")
        return ClothSim(gb.build_scene(cfg), dtype=jnp.float64, flags=flags)

    sim_ok = build(SimFlags(wind_enabled=True, gradient_clipping=False))
    # eps_backward unreachable in 1 iteration -> back_ok False every step
    sim_fb = build(SimFlags(wind_enabled=True, gradient_clipping=False,
                            max_backward_iters=1))
    sim_fb.eps_backward = 1e-16
    sim_fb2 = ClothSim(sim_fb.scene_host, dtype=jnp.float64,
                       flags=SimFlags(wind_enabled=True,
                                      gradient_clipping=False,
                                      max_backward_iters=1),
                       eps_backward=1e-16)

    p_gt = sim_ok.default_params()._replace(wind=jnp.array([0.4, 0.1, 0.3]))
    gt = sim_ok.rollout(p_gt)
    info = losses.LossInfo(target_x=jax.lax.stop_gradient(gt.full_x()))
    lf = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    p0 = sim_ok.default_params()._replace(wind=jnp.array([0.25, 0.05, 0.2]))

    L_ok, g_ok = sim_ok.episode_value_and_grad(lf)(p0)
    L_fb, g_fb = sim_fb2.episode_value_and_grad(lf)(p0)
    np.testing.assert_allclose(float(L_fb), float(L_ok), rtol=1e-10)
    # gradient through the all-GMRES adjoint matches the healthy adjoint
    np.testing.assert_allclose(np.asarray(g_fb.wind), np.asarray(g_ok.wind),
                               rtol=1e-4)

    def loss_of(params):
        recs = sim_fb2.simulate(params, sim_fb2.p_inv(params),
                                sim_fb2.x_fixed_seq(params))
        return float(lf(recs))

    d = 1e-6
    for i in range(3):
        fd = (loss_of(p0._replace(wind=p0.wind.at[i].add(d)))
              - loss_of(p0._replace(wind=p0.wind.at[i].add(-d)))) / (2 * d)
        np.testing.assert_allclose(float(g_fb.wind[i]), fd, rtol=2e-3,
                                   atol=1e-10)


def test_grad_parity_reduced_adjoint_cap_contact():
    """Reduced adjoint fixed-point cap on a CONTACT-stiff rollout: the
    episode gradient at cap 40 must match the reference-cap (400,
    Simulation.cpp:1561) adjoint AND central differences.  Validates the
    r5 throughput lever (a lower cap roughly halves the backward cost on
    chip, tools/adjoint_probe.py) before it can be a default."""
    from diffcloth_tpu.config import LossType, PrimitiveConfig
    from diffcloth_tpu.core import contact as ct

    fab = FabricConfig(cloth_dim_x=2.0, cloth_dim_y=2.0,
                       k_stiff_stretching=250.0, k_stiff_bending=0.05,
                       grid_num_x=6, grid_num_y=6, density=0.3)
    cfg = SceneConfig(
        fabric=fab, attachment_points=AttachmentConfig.NO_ATTACHMENTS,
        trajectory=TrajectoryConfig.NO_TRAJECTORY,
        primitive_config=PrimitiveConfig.PLANE_AND_SPHERE,
        wind_config=WindConfig.WIND_SIN,
        time_step=1.0 / 90.0, step_num=12,
        forward_convergence_thresh=1e-11,
        backward_convergence_thresh=1e-8, name="capcheck")
    scene = gb.build_scene(cfg)
    prims = ct.PrimitiveSet(
        kind=np.asarray([ct.P_SPHERE], np.int32),
        center=jnp.asarray([[0.0, -1.6, 0.0]], jnp.float64),
        velocity=jnp.zeros((1, 3), jnp.float64),
        radius=jnp.asarray([1.0], jnp.float64),
        length=jnp.asarray([0.0], jnp.float64),
        axis_rot=jnp.asarray(np.eye(3)[None], jnp.float64),
        plane_normal=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float64),
        plane_upper_left=jnp.zeros((1, 3), jnp.float64),
        plane_upper_right=jnp.zeros((1, 3), jnp.float64),
        rotates=np.asarray([False]),
        mu=jnp.asarray([0.5], jnp.float64), enabled=np.asarray([True]))

    def build(cap):
        return ClothSim(scene, dtype=jnp.float64, prims=prims,
                        flags=SimFlags(wind_enabled=True,
                                       gradient_clipping=False,
                                       max_backward_iters=cap))

    sim_ref = build(400)
    sim_low = build(40)
    # contact-stiff: the cloth drapes onto the sphere under gravity+wind
    p0 = sim_ref.default_params()._replace(wind=jnp.array([0.3, 0.0, 0.2]))
    gt = sim_ref.rollout(
        p0._replace(wind=jnp.array([0.45, 0.05, 0.25])))
    recs = sim_ref.rollout(p0)
    assert bool(np.asarray(recs.steps.converged).all())
    # the rollout must actually touch the sphere
    x_last = np.asarray(recs.steps.x[-1])
    assert np.min(np.linalg.norm(
        x_last - np.array([0.0, -1.6, 0.0]), axis=-1)) < 1.1

    info = losses.LossInfo(target_x=jax.lax.stop_gradient(gt.full_x()))
    lf = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    L_ref, g_ref = sim_ref.episode_value_and_grad(lf)(p0)
    L_low, g_low = sim_low.episode_value_and_grad(lf)(p0)
    np.testing.assert_allclose(float(L_low), float(L_ref), rtol=1e-12)
    for leaf in ("wind", "density", "k_pertype", "mu"):
        a = np.asarray(getattr(g_ref, leaf))
        b = np.asarray(getattr(g_low, leaf))
        # cap-40 truncation (non-converged steps fall to GMRES(16)) leaves
        # ~2e-5 relative residue on stiffness gradients — far below any
        # linesearch resolution; the FD check below is the hard oracle
        np.testing.assert_allclose(
            b, a, rtol=1e-3, atol=1e-10 + 1e-6 * np.abs(a).max(),
            err_msg=leaf)

    # and both match FD on the wind vector
    def loss_of(params):
        return float(lf(sim_ref.simulate(params, sim_ref.p_inv(params),
                                         sim_ref.x_fixed_seq(params))))

    d = 1e-6
    for i in range(3):
        wp = p0._replace(wind=p0.wind.at[i].add(d))
        wm = p0._replace(wind=p0.wind.at[i].add(-d))
        fd = (loss_of(wp) - loss_of(wm)) / (2 * d)
        # sanity anchor, not a tight oracle: bumping wind by delta moves
        # the frozen per-step contact SET, a discrete sensitivity the
        # adjoint (by design, like the reference's dr_df on the frozen
        # set) does not represent -> ~1-2% FD residue on contact rollouts
        # (the no-contact FD tests above hold 0.2%)
        assert np.isclose(fd, float(np.asarray(g_low.wind)[i]),
                          rtol=3e-2, atol=1e-9), (i, fd, g_low.wind)
