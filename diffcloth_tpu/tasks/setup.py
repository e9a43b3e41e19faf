"""Per-demo task setup: gradient masks, ground-truth parameters, loss
targets, and scene primitives.

reference: optimization/OptimizationTaskSetup.cpp —
`setInitialConditions` (:154-224), `setLossFunctionInformationAndType`
(:50-152) — and `Simulation::initScene` primitive placement
(Simulation.cpp:1804-2067).
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from diffcloth_tpu import losses
from diffcloth_tpu.config import (C_BEND, C_STRETCH, LossType,
                                  PrimitiveConfig, SimFlags, SplineType,
                                  TrajectoryConfig, WindConfig)
from diffcloth_tpu.core import contact as ct
from diffcloth_tpu.core.sim import ClothSim
from diffcloth_tpu.core.types import SimParams
from diffcloth_tpu.geometry import builder as gb
from diffcloth_tpu.optim.helper import GradMask
from diffcloth_tpu.tasks import registry


@dataclasses.dataclass
class TaskSetup:
    sim: ClothSim
    mask: GradMask
    loss_type: LossType
    loss_info: losses.LossInfo
    param_gt: SimParams              # ground-truth / "actual" params
    param_base: SimParams            # scene-state defaults (optimizer base)
    name: str

    def loss_fn(self):
        return losses.make_loss_fn(self.loss_type, self.loss_info)


def _prim_struct(entries, dtype) -> ct.PrimitiveSet:
    """Assemble a PrimitiveSet from a list of dicts."""
    P = len(entries)
    g = lambda key, default, shape: np.stack(
        [np.broadcast_to(np.asarray(e.get(key, default), np.float64), shape)
         for e in entries]) if P else np.zeros((0,) + shape)
    f = lambda a: jnp.asarray(a, dtype)
    return ct.PrimitiveSet(
        kind=np.asarray([e["kind"] for e in entries], np.int32),
        center=f(g("center", (0, 0, 0), (3,))),
        velocity=f(g("velocity", (0, 0, 0), (3,))),
        radius=f(g("radius", 0.0, ())),
        length=f(g("length", 0.0, ())),
        axis_rot=f(g("rot", np.eye(3), (3, 3))),
        plane_normal=f(g("normal", (0, 1, 0), (3,))),
        plane_upper_left=f(g("ul", (0, 0, 0), (3,))),
        plane_upper_right=f(g("ur", (0, 0, 0), (3,))),
        rotates=np.asarray([bool(e.get("rotates", False)) for e in entries]),
        mu=f(g("mu", 0.0, ())),
        enabled=np.ones((P,), bool),
        kinematic=np.asarray([bool(e.get("kinematic", False))
                              for e in entries]))


def lower_leg_entries(center, axis, leg_length=5.0, foot_length=4.0,
                      mu=0.0):
    """Flattened LowerLeg composite: joint sphere + foot capsule + leg
    capsule (reference: LowerLeg ctor, Primitive.cpp:383-407; contact order
    joint, foot, leg :404-406 / :412-415).  `axis` is the foot direction;
    the leg bends along local (0, 0.7, 0.3)."""
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    radius = 0.8
    # foot capsule: rotationFromParent == globalRotation == R(y -> axis)
    # (Capsule ctor, Primitive.cpp:450-472 with parentAxis = (0,1,0))
    rot_foot = gb.axis_to_rotation(axis, np.array([0.0, 1.0, 0.0]))
    # leg capsule: rotationFromParent = R(y -> legLocalAxis); globalAxis =
    # rotationFromParent @ parentAxis(= foot axis); globalRotation =
    # R(y -> globalAxis)
    leg_local_axis = np.array([0.0, 0.7, 0.3])
    rot_from_parent = gb.axis_to_rotation(
        leg_local_axis / np.linalg.norm(leg_local_axis),
        np.array([0.0, 1.0, 0.0]))
    leg_global_axis = rot_from_parent @ axis
    rot_leg = gb.axis_to_rotation(leg_global_axis,
                                  np.array([0.0, 1.0, 0.0]))
    # the knee (leg anchor + joint sphere) sits at the END of the FOOT
    # capsule: legCenter = foot.rotationFromParent @ (0, footLength, 0)
    # (LowerLeg ctor, Primitive.cpp:397-402).  Round 1-2 wrongly used the
    # LEG's rotationFromParent here, displacing the knee, the whole leg
    # capsule, and every leg keypoint by ~1.6 units — the root cause of
    # the sock optimization plateau (unreachable keypoint targets).
    knee = rot_foot @ np.array([0.0, foot_length, 0.0])
    center = np.asarray(center, np.float64)
    return [
        dict(kind=ct.P_SPHERE, center=center + knee, radius=radius + 0.05,
             mu=mu),
        dict(kind=ct.P_CAPSULE, center=center, radius=radius,
             length=foot_length, rot=rot_foot, mu=mu),
        dict(kind=ct.P_CAPSULE, center=center + knee, radius=radius,
             length=leg_length, rot=rot_leg, mu=mu),
    ], dict(knee=knee, rot_leg=rot_leg, rot_foot=rot_foot, radius=radius)


def _make_primitives(scene: gb.Scene, dtype):
    """Obstacle placement per scene (initScene, Simulation.cpp:1804-1990).

    Returns (PrimitiveSet on device, host entry dicts).  Task setup reads
    geometry from the HOST entries — reading it back off the device is a
    pointless round-trip that can wedge on flaky remote-TPU transports
    (observed: a 3-float transfer hanging indefinitely during sock
    setup)."""
    cfg = scene.cfg
    pc = cfg.primitive_config
    lo, hi = scene.rest_min, scene.rest_max

    def mk(kind, center, **kw):
        entries = [dict(kind=kind, center=center, **kw)]
        return _prim_struct(entries, dtype), entries

    center_low = 0.5 * (lo + hi)
    center_low = np.array([center_low[0], lo[1], center_low[2]])
    center_high = 0.5 * (lo + hi)
    center_high = np.array([center_high[0], hi[1], center_high[2]])

    if pc == PrimitiveConfig.NONE:
        return ct.empty_primitive_set(dtype), []
    if pc == PrimitiveConfig.PLANE_AND_SPHERE:
        # rotating-sphere demo: only sphere2 (r=2) is a contact primitive
        # (Simulation.cpp:1826-1829, 1894-1903); sphere sits below the cloth
        radius = 2.0  # Simulation.h:470 sphere2 ctor
        plane_center = center_low - np.array([0, radius * 2 + 0.1, 0])
        center = plane_center + np.array([radius * 0.3, radius,
                                          radius * 0.1])
        return mk(ct.P_SPHERE, center, radius=radius, mu=0.9, rotates=False)
    if pc == PrimitiveConfig.BIG_SPHERE:
        return mk(ct.P_SPHERE, (-0.5, -16.0, 0.0), radius=15.0, mu=0.0)
    if pc == PrimitiveConfig.PLANE_BUST_WEARHAT:
        # sphere head (r=2.1, Simulation.h:471) above a plane
        # (Simulation.cpp:1932-1943); only the head is a contact primitive
        radius = 2.1
        plane_center = center_low - np.array([0, 0.5, 0]) - np.array([0, 0, 4])
        head = plane_center + np.array([0, radius + 0.5, -4])
        return mk(ct.P_SPHERE, head, radius=radius, mu=0.1)
    if pc in (PrimitiveConfig.SLOPE, PrimitiveConfig.SLOPE_SIMPLIFIED):
        # slope = Plane(center (0,-11,10), UL (-8,-1,-1), UR (8,-1,-1))
        # (Simulation.h:474); placement per initScene SLOPE_SIMPLIEFIED
        # (Simulation.cpp:1963-1976)
        ul = np.array([-8.0, -1.0, -1.0]) - np.array([0.0, -11.0, 10.0])
        ur = np.array([8.0, -1.0, -1.0]) - np.array([0.0, -11.0, 10.0])
        normal = np.cross(ur, ul)
        normal = normal / np.linalg.norm(normal)
        lower_right = -ul
        shift = (lower_right - ur) * 0.4
        ref_idx = 285 if scene.n > 285 else scene.n // 2
        ref = scene.x_rest[ref_idx]
        center = ref + shift + np.array([0.0, -0.3, 0.0])
        return mk(ct.P_PLANE, center, normal=normal, ul=ul, ur=ur, mu=0.2)
    if pc == PrimitiveConfig.FOOT:
        center = center_high + np.array([0.0, 3.0, -4.0])  # :1922
        entries, _ = lower_leg_entries(
            center, np.asarray(cfg.sock_leg_orientation), 5.0, 4.0, mu=0.0)
        return _prim_struct(entries, dtype), entries
    if pc == PrimitiveConfig.Y0PLANE:
        return mk(ct.P_BOWL, (0, 0.5, 0), radius=0.5, mu=0.0)
    raise NotImplementedError(pc)


def _generate_groundtruth(sim: ClothSim, params: SimParams):
    recs = sim.rollout_chunked(params)
    return np.asarray(recs.full_x())


def build_task(demo: str, dtype=jnp.float32, keypoint_tau: float = 0.0,
               max_backward_iters: int = None,
               **sim_kwargs) -> TaskSetup:
    task = registry.DEMOS[demo]
    cfg = task.scene
    scene = gb.build_scene(cfg)
    prims, prim_entries = _make_primitives(scene, dtype)
    spline_type = SplineType.ENDPOINT
    if demo in ("hat", "sock"):
        # resetSplineConfigsForControlTasks (OptimizationTaskSetup.cpp:38-46)
        spline_type = SplineType.ENDPOINT_AND_TANGENTS

    flags = SimFlags(
        wind_enabled=(demo in ("wind", "tshirt", "wind_sim2real")),
        contact_enabled=True, self_collision_enabled=True)
    if max_backward_iters is not None:
        import dataclasses as _dc
        flags = _dc.replace(flags, max_backward_iters=max_backward_iters)
    sim = ClothSim(scene, dtype=dtype, prims=prims, flags=flags,
                   spline_type=spline_type, **sim_kwargs)

    base = sim.default_params()
    mask = GradMask()
    param_gt = base
    loss_info = losses.LossInfo()
    loss_type = task.loss_type

    if demo == "wind":
        # setInitialConditions DEMO_WIND (:158-164)
        mask = GradMask(f_ext=True)
        param_gt = base._replace(
            wind=jnp.asarray(np.array([0.0, 1.0, 1.0]) * 0.02 * 0.2, dtype))
    elif demo == "tshirt":
        # DEMO_WIND_TSHIRT (:165-175): optimize k_stretch + wind-5
        mask = GradMask(k_pertype=(False, False, True, False), f_wind=True)
        wind_gt = np.array([1.0, 0.1, 1.0])
        wind_gt = wind_gt / np.linalg.norm(wind_gt) * 0.1 * 0.15
        param_gt = base._replace(
            k_pertype=base.k_pertype.at[C_STRETCH].set(
                cfg.fabric.k_stiff_stretching),
            wind=jnp.asarray(wind_gt, dtype),
            wind_freq=jnp.asarray(10.0, dtype),
            wind_phase=jnp.asarray(0.5, dtype))
    elif demo == "wind_sim2real":
        # DEMO_WIND_SIM2REAL (setWindSim2realInitialParams,
        # OptimizationTaskSetup.cpp:21-36): WIND_SIN_AND_FALLOFF, optimize
        # wind-5 + k_stretch + k_bend + density toward the "actual"
        # sim2real parameters.  The reference fits captured animation
        # frames (loadWindSim2RealAnimationSequence); without the (unshipped)
        # animation assets the ground truth is generated by simulation.
        mask = GradMask(f_wind=True, density=True,
                        k_pertype=(False, False, True, True))
        wind_gt = np.array([1.0, 0.1, 1.0])
        wind_gt = wind_gt / np.linalg.norm(wind_gt) * 1.0
        param_gt = base._replace(
            wind=jnp.asarray(wind_gt, dtype),
            wind_freq=jnp.asarray(14.0, dtype),
            wind_phase=jnp.asarray(0.0, dtype),
            k_pertype=base.k_pertype.at[C_STRETCH].set(3000.0)
            .at[C_BEND].set(0.01),
            density=jnp.asarray(0.15, dtype))
    elif demo == "sphere":
        # DEMO_SPHERE_ROTATE (:178-184)
        mask = GradMask(mu_primitives=(0,))
        param_gt = base._replace(mu=base.mu.at[0].set(0.3))
    elif demo == "dress":
        # DEMO_DRESS_TWIRL (:213-220)
        mask = GradMask(density=True,
                        k_pertype=(False, False, False, True))
        param_gt = base._replace(
            density=jnp.asarray(0.01, dtype),
            k_pertype=base.k_pertype.at[C_STRETCH].set(2.0))
        loop = np.where(np.abs(scene.x_rest[:, 1] - scene.rest_min[1])
                        < 1.2)[0]
        loss_info = dataclasses.replace(
            loss_info, target_twirl_height=0.3,
            loop_points=jnp.asarray(loop, jnp.int32),
            rest_min=jnp.asarray(scene.rest_min, dtype),
            rest_max=jnp.asarray(scene.rest_max, dtype))
    elif demo == "slope":
        # DEMO_SLOPE_PERF (:205-211): optimize friction; target = cloth
        # translated to the slope end (setLossFunctionInformationAndType
        # :127-133)
        mask = GradMask(mu_primitives=(0,))
        param_gt = base._replace(mu=base.mu.at[0].set(0.5))
        ul = np.array([-8.0, -1.0, -1.0]) - np.array([0.0, -11.0, 10.0])
        ur = np.array([8.0, -1.0, -1.0]) - np.array([0.0, -11.0, 10.0])
        slope_end = (-ur) + (-ul)   # lowerLeft + lowerRight (relative)
        translation = slope_end - 0.5 * (scene.rest_min + scene.rest_max)
        loss_info = dataclasses.replace(
            loss_info,
            x_init=jnp.asarray(scene.x_rest, dtype),
            target_translation=jnp.asarray(translation, dtype))
    elif demo == "hat":
        # DEMO_WEAR_HAT (:196-203, :56-72): optimize spline control points;
        # target = hat translated onto the bust
        mask = GradMask(control_points=True)
        head_center = np.asarray(prim_entries[0]["center"], np.float64)
        head_radius = float(prim_entries[0]["radius"])
        bust_center = head_center + np.array([0, head_radius * 0.6, 0])
        hat_center = 0.5 * (scene.rest_min + scene.rest_max)
        translation = bust_center - hat_center
        loss_info = dataclasses.replace(
            loss_info,
            x_init=jnp.asarray(scene.x_rest, dtype),
            target_translation=jnp.asarray(translation, dtype))
        # initScene CORNERS_2_WEARHAT moves the spline endpoints onto the
        # bust with yUp=15 (Simulation.cpp:1994-2022)
        from diffcloth_tpu.core import spline as spl
        p1 = jnp.asarray(scene.stages[0].fixed_pos_rest + translation, dtype)
        yup = jnp.full((p1.shape[0],), 15.0, dtype)
        base = base._replace(spline=spl.default_params_from_endpoints(
            sim.stage_dev.spline_p0, p1, yup))
        param_gt = base
    elif demo == "sock":
        # DEMO_WEAR_SOCK (:196-203, :75-125): optimize spline control
        # points; ASSISTED_DRESSING_KEYPOINTS on foot/leg anatomy
        mask = GradMask(control_points=True)
        center = np.asarray(prim_entries[1]["center"], np.float64)  # foot base
        _, geo = lower_leg_entries(center,
                                   np.asarray(cfg.sock_leg_orientation))
        leg_len, foot_len, r = 5.0, 4.0, geo["radius"]
        knee = geo["knee"]
        R_leg, R_foot = geo["rot_leg"], geo["rot_foot"]

        def leg_pt(o):
            return center + knee + R_leg @ np.asarray(o, np.float64)

        def foot_pt(o):
            return center + R_foot @ np.asarray(o, np.float64)

        N = cfg.step_num
        kp = []   # (frame, target, candidates)
        kp.append((N, foot_pt((0, foot_len, -r)), [2, 20, 336, 792, 995]))
        toe_pts = [865, 420, 946, 250, 80]
        kp.append((N, foot_pt((0, -r, 0)), toe_pts))
        kp.append((N, foot_pt((0, foot_len * 0.5, r)), [282, 343, 249]))
        top_front = [104, 27, 43, 475, 392, 903, 416, 413, 895]
        top_left = [11, 30, 164, 755, 30]
        top_right = [563, 43, 474, 14]
        opening_back = [102, 81, 842, 318, 12]
        kp.append((N, leg_pt((0, leg_len, r)), top_front))
        kp.append((N, leg_pt((-r, leg_len, 0)), top_left))
        kp.append((N, leg_pt((r, leg_len, 0)), top_right))
        kp.append((N, leg_pt((0, leg_len, -r)), opening_back))
        kp.append((N, leg_pt((0, leg_len * 0.4, -r)), [37, 241, 349]))
        for i in range(3):   # opening weighting (:115-120)
            fr = int(N * 0.62) + i
            kp.append((fr, foot_pt((0, -r, 0)), top_front))
            kp.append((fr, foot_pt((0, 0, -r)), opening_back))
            kp.append((fr, foot_pt((-r, 0, 0)), top_left))
            kp.append((fr, foot_pt((r, 0, 0)), top_right))
        C = max(len(c) for _, _, c in kp)
        frames = np.array([f for f, _, _ in kp], np.int32)
        targets = np.stack([t for _, t, _ in kp])
        cands = np.full((len(kp), C), -1, np.int32)
        for i, (_, _, c) in enumerate(kp):
            cands[i, :len(c)] = c
        loss_info = dataclasses.replace(
            loss_info,
            keypoint_frames=jnp.asarray(frames),
            keypoint_targets=jnp.asarray(targets, dtype),
            keypoint_candidates=jnp.asarray(cands),
            keypoint_tau=keypoint_tau)
        # CORNERS_2_WEARSOCK spline endpoints (Simulation.cpp:2024-2053):
        # translation from sock top to foot top, yUp = -28
        foot_top = center + np.array([0.0, leg_len + 2 * r, 0.0])
        sock_top = np.array([
            0.5 * (scene.rest_min[0] + scene.rest_max[0]),
            scene.rest_max[1], scene.rest_min[2] + r])
        translation = foot_top - sock_top
        from diffcloth_tpu.core import spline as spl
        p1 = jnp.asarray(scene.stages[0].fixed_pos_rest + translation, dtype)
        yup = jnp.full((p1.shape[0],), -28.0, dtype)
        base = base._replace(spline=spl.default_params_from_endpoints(
            sim.stage_dev.spline_p0, p1, yup))
        param_gt = base
    else:
        raise KeyError(demo)

    if task.generate_groundtruth_simulation:
        gt_x = _generate_groundtruth(sim, param_gt)
        loss_info = dataclasses.replace(loss_info, target_x=gt_x)

    return TaskSetup(sim=sim, mask=mask, loss_type=loss_type,
                     loss_info=loss_info, param_gt=param_gt,
                     param_base=base, name=demo)
