"""Obstacle contact + dry friction + self-collision machinery.

Physics oracles: non-penetration at rest, Coulomb stick/slide case split,
friction-coefficient gradients vs finite differences, and the layering
invariant the reference asserts in debug builds (Simulation.cpp:605-613).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcloth_tpu import losses
from diffcloth_tpu.config import (AttachmentConfig, FabricConfig, LossType,
                                  PrimitiveConfig, SceneConfig, SimFlags,
                                  TrajectoryConfig, WindConfig)
from diffcloth_tpu.core import contact as ct
from diffcloth_tpu.core import selfcol as sc
from diffcloth_tpu.core.sim import ClothSim
from diffcloth_tpu.geometry import builder as gb


def sphere_prims(center, radius, mu, dtype=jnp.float64):
    f = lambda a: jnp.asarray(np.asarray(a, np.float64)[None], dtype)
    return ct.PrimitiveSet(
        kind=np.asarray([ct.P_SPHERE], np.int32), center=f(center),
        velocity=f((0, 0, 0)), radius=jnp.asarray([radius], dtype),
        length=jnp.asarray([0.0], dtype),
        axis_rot=jnp.asarray(np.eye(3)[None], dtype),
        plane_normal=f((0, 1, 0)), plane_upper_left=f((0, 0, 0)),
        plane_upper_right=f((0, 0, 0)), rotates=np.asarray([False]),
        mu=jnp.asarray([mu], dtype), enabled=np.asarray([True]))


def drop_scene(steps=40):
    fab = FabricConfig(cloth_dim_x=2.0, cloth_dim_y=2.0,
                       k_stiff_stretching=250.0, k_stiff_bending=0.05,
                       grid_num_x=7, grid_num_y=7, density=0.3)
    return SceneConfig(
        fabric=fab, attachment_points=AttachmentConfig.NO_ATTACHMENTS,
        trajectory=TrajectoryConfig.NO_TRAJECTORY,
        primitive_config=PrimitiveConfig.PLANE_AND_SPHERE,
        wind_config=WindConfig.NO_WIND,
        time_step=1.0 / 90.0, step_num=steps,
        forward_convergence_thresh=1e-9, name="drop")


@pytest.fixture(scope="module")
def drop_sim():
    scene = gb.build_scene(drop_scene())
    prims = sphere_prims((0.0, -2.0, 0.0), 1.0, 0.5)
    return ClothSim(scene, dtype=jnp.float64, prims=prims,
                    flags=SimFlags(wind_enabled=False,
                                   gradient_clipping=False))


def test_cloth_lands_on_sphere(drop_sim):
    """Free-falling cloth must be stopped by the sphere: final min distance
    to the sphere center stays ~radius, not below."""
    p = drop_sim.default_params()
    recs = drop_sim.rollout(p)
    x_last = np.asarray(recs.steps.x[-1])
    d = np.linalg.norm(x_last - np.array([0.0, -2.0, 0.0]), axis=1)
    assert np.all(np.isfinite(x_last))
    # without the sphere the cloth would be far below (free fall ~0.99)
    assert d.min() > 0.85, f"cloth penetrated sphere: min dist {d.min()}"
    # and the cloth actually reached the sphere (it draped, not hovering)
    assert d.min() < 1.15


def test_friction_slows_sliding():
    """Higher mu must dissipate more energy on a draped cloth."""
    scene = gb.build_scene(drop_scene(steps=50))
    final_speed = {}
    for mu in (0.05, 0.9):
        prims = sphere_prims((0.3, -2.0, 0.1), 1.0, mu)
        sim = ClothSim(scene, dtype=jnp.float64, prims=prims,
                       flags=SimFlags(wind_enabled=False))
        recs = sim.rollout(sim.default_params())
        final_speed[mu] = float(jnp.linalg.norm(recs.steps.v[-1]))
    assert final_speed[0.9] < final_speed[0.05]


def test_grad_mu_matches_fd(drop_sim):
    """d(loss)/d(mu) via the implicit adjoint vs central differences
    (reference: calculatedri_dmu chain, Simulation.cpp:865-879)."""
    sim = drop_sim
    p_gt = sim.default_params()._replace(mu=jnp.asarray([0.3]))
    gt = sim.rollout(p_gt)
    info = losses.LossInfo(target_x=jax.lax.stop_gradient(gt.full_x()))
    lf = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    vg = sim.episode_value_and_grad(lf)
    p0 = sim.default_params()._replace(mu=jnp.asarray([0.6]))
    L, g = vg(p0)
    assert float(L) > 0

    def loss_of(mu):
        params = p0._replace(mu=jnp.asarray([mu]))
        recs = sim.simulate(params, sim.p_inv(params),
                            sim.x_fixed_seq(params))
        return float(lf(recs))

    d = 1e-6
    fd = (loss_of(0.6 + d) - loss_of(0.6 - d)) / (2 * d)
    ad = float(g.mu[0])
    assert np.isclose(fd, ad, rtol=5e-3), f"fd={fd} adjoint={ad}"


def test_dry_friction_cases():
    """Take-off / stick / slide case split (Simulation.cpp:829-862)."""
    n = jnp.array([[0.0, 1.0, 0.0]])
    mu = jnp.array([0.5])
    # take-off: normal force outward -> r = 0
    r = ct.dry_friction_force(n, jnp.array([[0.1, 2.0, 0.0]]), mu)
    np.testing.assert_allclose(np.asarray(r), 0.0)
    # stick: |f_T| <= mu |f_N| -> full reversal
    d = jnp.array([[0.3, -1.0, 0.0]])
    r = ct.dry_friction_force(n, d, mu)
    np.testing.assert_allclose(np.asarray(r), -np.asarray(d), atol=1e-12)
    # slide: |f_T| > mu |f_N| -> r_T = -mu |f_N| t_hat
    d = jnp.array([[2.0, -1.0, 0.0]])
    r = ct.dry_friction_force(n, d, mu)
    np.testing.assert_allclose(np.asarray(r)[0], [-0.5, 1.0, 0.0],
                               atol=1e-12)


def test_self_collision_detection_and_layering():
    """Crafted chain of overlapping particles: detection finds exactly the
    overlapping pairs; layering gives each particle <= 1 pair per layer."""
    # 5 points in a line, spacing 0.3, radii 0.2 -> neighbors overlap
    x = jnp.asarray(np.stack([np.arange(5) * 0.3,
                              np.zeros(5), np.zeros(5)], 1))
    v = jnp.zeros_like(x)
    radii = jnp.full((5,), 0.2)
    conn = np.zeros((5, 5), bool)           # no mesh adjacency exclusions
    cand = jnp.asarray(sc.build_candidate_pairs(conn), jnp.int32)
    cs = sc.detect_self_collisions(cand, radii, x, v, h=0.01, cap_pairs=8)
    got = {(int(i), int(j)) for i, j, m in
           zip(cs.pair_i, cs.pair_j, cs.mask) if m}
    assert got == {(0, 1), (1, 2), (2, 3), (3, 4)}
    assert not bool(cs.overflow)

    cs = sc.assign_layers(cs, 5, max_layers=8)
    layers = {}
    for i, j, m, l in zip(cs.pair_i, cs.pair_j, cs.mask, cs.layer):
        if m:
            layers.setdefault(int(l), []).append((int(i), int(j)))
    # every active pair assigned
    assert sum(len(v) for v in layers.values()) == 4
    # invariant: within one layer each particle appears at most once
    for l, prs in layers.items():
        seen = [p for pr in prs for p in pr]
        assert len(seen) == len(set(seen)), f"layer {l} reuses a particle"


def test_self_collision_overflow_flag():
    x = jnp.zeros((6, 3))                   # all coincident -> 15 pairs
    v = jnp.zeros_like(x)
    radii = jnp.full((6,), 0.2)
    cand = jnp.asarray(sc.build_candidate_pairs(np.zeros((6, 6), bool)),
                       jnp.int32)
    cs = sc.detect_self_collisions(cand, radii, x, v, h=0.01, cap_pairs=4)
    assert bool(cs.overflow)


def test_self_friction_conserves_momentum():
    """Pairwise self-contact forces are equal and opposite: total friction
    impulse over all particles is zero."""
    rng = np.random.RandomState(0)
    n = 8
    x = jnp.asarray(rng.randn(n, 3) * 0.1)
    f = jnp.asarray(rng.randn(n, 3))
    mass = jnp.asarray(rng.rand(n) + 0.5)
    conn = np.zeros((n, n), bool)
    cand = jnp.asarray(sc.build_candidate_pairs(conn), jnp.int32)
    cs = sc.detect_self_collisions(cand, jnp.full((n,), 0.2), x,
                                   jnp.zeros_like(x), 0.01, cap_pairs=32)
    cs = sc.assign_layers(cs, n, max_layers=8)
    r = sc.self_friction(f, cs, mass, jnp.zeros_like(f), 8,
                         ct.dry_friction_force)
    total = np.asarray(jnp.sum(r, axis=0))
    np.testing.assert_allclose(total, 0.0, atol=1e-10)
    assert float(jnp.linalg.norm(r)) > 0  # something actually happened


def test_grad_spline_through_contact():
    """Spline control-point gradients through a contact-rich rollout — the
    hat/sock control-task path.  Locks in the safe-norm friction VJP and
    the GMRES fallback for the backward solve (a NaN or exploding adjoint
    here is exactly the bug class that broke the hat demo)."""
    from diffcloth_tpu.config import SplineType
    from diffcloth_tpu.core import spline as spl

    fab = FabricConfig(cloth_dim_x=2.0, cloth_dim_y=2.0,
                       k_stiff_stretching=250.0, k_stiff_bending=0.05,
                       grid_num_x=5, grid_num_y=5, density=0.3)
    cfg = SceneConfig(
        fabric=fab, attachment_points=AttachmentConfig.LEFT_RIGHT_CORNERS_2,
        trajectory=TrajectoryConfig.CORNERS_2_WEARHAT,
        primitive_config=PrimitiveConfig.NONE,
        wind_config=WindConfig.NO_WIND,
        time_step=1.0 / 90.0, step_num=8,
        forward_convergence_thresh=1e-11,
        backward_convergence_thresh=1e-8, name="spline_contact")
    scene = gb.build_scene(cfg)
    # sphere placed so the swinging cloth grazes it
    prims = sphere_prims((0.0, -1.2, 0.0), 0.8, 0.4)
    sim = ClothSim(scene, dtype=jnp.float64, prims=prims,
                   spline_type=SplineType.ENDPOINT_AND_TANGENTS,
                   flags=SimFlags(wind_enabled=False,
                                  gradient_clipping=False))
    params = sim.default_params()
    # drive the clips downward toward the sphere
    p1 = jnp.asarray(np.asarray(sim.stage_dev.spline_p0)
                     + np.array([0.0, -1.0, 0.0]), jnp.float64)
    params = params._replace(spline=spl.default_params_from_endpoints(
        sim.stage_dev.spline_p0, p1, sim.stage_dev.spline_yup))

    target = jnp.asarray(scene.x_rest + np.array([0.0, -0.8, 0.0]),
                         jnp.float64)
    info = losses.LossInfo(x_init=jnp.asarray(scene.x_rest, jnp.float64),
                           target_translation=jnp.asarray(
                               [0.0, -0.8, 0.0], jnp.float64))
    loss_fn = losses.make_loss_fn(LossType.MATCHSHAPE_WITH_TRANSLATION, info)
    vg = sim.episode_value_and_grad(loss_fn)
    L0, grads = vg(params)
    g = np.asarray(grads.spline)
    assert np.all(np.isfinite(g)), "NaN/Inf spline gradient through contact"
    assert np.linalg.norm(g) < 1e4, f"exploding adjoint: |g|={np.linalg.norm(g)}"
    assert np.linalg.norm(g) > 0

    # FD check on one control-point coordinate.  Tolerance is loose on
    # purpose: the adjoint differentiates with the per-step contact set
    # frozen (as the reference does, Simulation.cpp:1510-1522), while a
    # finite-difference perturbation can flip set membership mid-episode —
    # the residual discrepancy is the contact-switching subgradient, not an
    # adjoint bug.
    d = 1e-6
    idx = (0, 1)
    up = params._replace(spline=params.spline.at[idx].add(d))
    dn = params._replace(spline=params.spline.at[idx].add(-d))
    fd = (float(vg(up)[0]) - float(vg(dn)[0])) / (2 * d)
    ad = float(g[idx])
    assert np.isclose(fd, ad, rtol=0.15, atol=1e-10), (fd, ad)
    assert np.sign(fd) == np.sign(ad)


def test_kinematic_primitive_stepping():
    """A sphere moving with constant velocity must be tested at its
    advanced pose center(t) = c0 + t*v (reference stepPrimitives,
    Simulation.cpp:954-960; Primitive::step, Primitive.h:129-136), and the
    cloth must ride with it via the v_out friction term."""
    prims = sphere_prims((0.0, -2.0, 0.0), 0.8, 0.9)
    vel = jnp.asarray(np.array([[0.5, 0.0, 0.0]]), jnp.float64)
    prims = prims._replace(velocity=vel,
                           kinematic=np.asarray([True]))

    # pose advance: at t the sphere center has moved t*v
    moved = ct.prims_at_time(prims, 2.0)
    np.testing.assert_allclose(np.asarray(moved.center[0]),
                               [1.0, -2.0, 0.0])
    static = prims._replace(kinematic=np.asarray([False]))
    np.testing.assert_allclose(
        np.asarray(ct.prims_at_time(static, 2.0).center[0]),
        [0.0, -2.0, 0.0])

    # detection sees the advanced pose: a particle above the ORIGINAL
    # center is in contact at t=0 but not after the sphere moved away
    x = jnp.asarray(np.array([[0.0, -1.15, 0.0]]), jnp.float64)
    v = jnp.zeros_like(x)
    c0 = ct.detect_obstacle_contacts(prims, x, v, h=0.01, t=0.0)
    c2 = ct.detect_obstacle_contacts(prims, x, v, h=0.01, t=4.0)
    assert bool(c0.mask[0]) and not bool(c2.mask[0])

    # full rollout: cloth dropped on the moving sphere is dragged along x
    cfg = drop_scene(steps=30)
    scene = gb.build_scene(cfg)
    sim_kin = ClothSim(scene, dtype=jnp.float64, prims=prims,
                       flags=SimFlags(wind_enabled=False))
    sim_static = ClothSim(scene, dtype=jnp.float64, prims=static,
                          flags=SimFlags(wind_enabled=False))
    p = sim_kin.default_params()
    xk = np.asarray(sim_kin.rollout(p).steps.x[-1])
    xs = np.asarray(sim_static.rollout(p).steps.x[-1])
    assert np.all(np.isfinite(xk)) and np.all(np.isfinite(xs))
    # the advancing obstacle pose must change the contact response
    assert np.max(np.abs(xk - xs)) > 1e-3


def test_bowl_contact_geometry():
    """Bowl = thin lower-hemisphere inner shell (Bowl::isInContact,
    Primitive.cpp:360-379): inside-interior and upper-half points do NOT
    collide; points within 0.005 of the lower shell do, with inward
    normal."""
    f = lambda a: jnp.asarray(np.asarray(a, np.float64)[None], jnp.float64)
    prims = ct.PrimitiveSet(
        kind=np.asarray([ct.P_BOWL], np.int32), center=f((0.0, 0.5, 0.0)),
        velocity=f((0, 0, 0)), radius=jnp.asarray([0.5], jnp.float64),
        length=jnp.asarray([0.0], jnp.float64),
        axis_rot=jnp.asarray(np.eye(3)[None], jnp.float64),
        plane_normal=f((0, 1, 0)), plane_upper_left=f((0, 0, 0)),
        plane_upper_right=f((0, 0, 0)), rotates=np.asarray([False]),
        mu=jnp.asarray([0.0], jnp.float64), enabled=np.asarray([True]))
    pts = jnp.asarray(np.array([
        [0.0, 0.001, 0.0],    # on the shell bottom (y = c_y - r + 1e-3)... 
        [0.0, 0.3, 0.0],      # deep interior, lower half -> no contact
        [0.0, 0.999, 0.0],    # near shell but UPPER half -> no contact
        [0.0, 0.5 - 0.497, 0.0],  # within eps of the lower shell -> contact
    ]), jnp.float64)
    v = jnp.zeros_like(pts)
    cs = ct.detect_obstacle_contacts(prims, pts, v, h=0.0)
    mask = np.asarray(cs.mask)
    assert bool(mask[3]), "lower-shell point must collide"
    assert not bool(mask[1]), "deep interior must not collide"
    assert not bool(mask[2]), "upper hemisphere must not collide"
    # normal points inward (toward the center, i.e. +y at the bottom)
    assert float(cs.normal[3, 1]) > 0.9
