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
from typing import Optional, Tuple

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
from diffcloth_tpu.geometry import objio
from diffcloth_tpu.optim.helper import GradMask
from diffcloth_tpu.tasks import registry


@dataclasses.dataclass
class TaskSetup:
    sim: ClothSim
    mask: GradMask
    loss_type: LossType
    loss_info: losses.LossInfo
    param_gt: SimParams              # ground-truth / initial actual params
    name: str

    def loss_fn(self):
        return losses.make_loss_fn(self.loss_type, self.loss_info)


def _make_primitives(scene: gb.Scene, dtype) -> ct.PrimitiveSet:
    """Obstacle placement per scene (initScene, Simulation.cpp:1804-1990)."""
    cfg = scene.cfg
    pc = cfg.primitive_config
    lo, hi = scene.rest_min, scene.rest_max

    def mk(kind, center, radius=0.0, length=0.0, mu=0.0, rotates=False,
           normal=(0, 1, 0), ul=(0, 0, 0), ur=(0, 0, 0), rot=np.eye(3)):
        f = lambda a: jnp.asarray(np.asarray(a, np.float64)[None], dtype)
        return ct.PrimitiveSet(
            kind=np.asarray([kind], np.int32), center=f(center),
            velocity=f((0, 0, 0)), radius=jnp.asarray([radius], dtype),
            length=jnp.asarray([length], dtype),
            axis_rot=jnp.asarray(np.asarray(rot)[None], dtype),
            plane_normal=f(normal), plane_upper_left=f(ul),
            plane_upper_right=f(ur),
            rotates=np.asarray([rotates]), mu=jnp.asarray([mu], dtype),
            enabled=np.asarray([True]))

    center_low = 0.5 * (lo + hi)
    center_low = np.array([center_low[0], lo[1], center_low[2]])

    if pc == PrimitiveConfig.NONE:
        return ct.empty_primitive_set(dtype)
    if pc == PrimitiveConfig.PLANE_AND_SPHERE:
        # rotating-sphere demo: only sphere2 (r=2) is a contact primitive
        # (Simulation.cpp:1826-1829, 1894-1903); sphere sits below the cloth
        radius = 2.0  # Simulation.h ctor sphere2(..., 2, ...)
        plane_center = center_low - np.array([0, radius * 2 + 0.1, 0])
        center = plane_center + np.array([radius * 0.3, radius,
                                          radius * 0.1])
        return mk(ct.P_SPHERE, center, radius=radius, mu=0.9, rotates=False)
    if pc == PrimitiveConfig.BIG_SPHERE:
        return mk(ct.P_SPHERE, (-0.5, -16.0, 0.0), radius=15.0, mu=0.0)
    if pc == PrimitiveConfig.PLANE_BUST_WEARHAT:
        # sphere head above a plane (Simulation.cpp:1932-1943); head r=2.5
        # (Simulation.h ctor sphere_head)
        radius = 2.5
        plane_center = center_low - np.array([0, 0.5, 0]) - np.array([0, 0, 4])
        head = plane_center + np.array([0, radius + 0.5, -4])
        return mk(ct.P_SPHERE, head, radius=radius, mu=0.1)
    if pc in (PrimitiveConfig.SLOPE, PrimitiveConfig.SLOPE_SIMPLIFIED):
        raise NotImplementedError("slope plane primitive: next round")
    if pc == PrimitiveConfig.FOOT:
        raise NotImplementedError("sock leg composite: next round")
    if pc == PrimitiveConfig.Y0PLANE:
        return mk(ct.P_BOWL, (0, 0.5, 0), radius=0.5, mu=0.0)
    raise NotImplementedError(pc)


def _generate_groundtruth(sim: ClothSim, params: SimParams):
    recs = sim.rollout(params)
    return jax.lax.stop_gradient(recs.full_x())


def build_task(demo: str, dtype=jnp.float32, **sim_kwargs) -> TaskSetup:
    task = registry.DEMOS[demo]
    cfg = task.scene
    scene = gb.build_scene(cfg)
    prims = _make_primitives(scene, dtype)
    spline_type = SplineType.ENDPOINT
    if demo in ("hat", "sock"):
        # resetSplineConfigsForControlTasks (OptimizationTaskSetup.cpp:38-46)
        spline_type = SplineType.ENDPOINT_AND_TANGENTS

    flags = SimFlags(
        wind_enabled=(demo in ("wind", "tshirt")),
        contact_enabled=True, self_collision_enabled=True)
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
    elif demo in ("hat", "sock", "slope"):
        if demo in ("hat", "sock"):
            mask = GradMask(control_points=True)
        else:
            mask = GradMask(mu_primitives=(0,))
        # full loss wiring for these contact demos lands with their
        # primitives/self-collision support
        raise NotImplementedError(
            f"demo '{demo}' requires contact machinery scheduled this round")
    else:
        raise KeyError(demo)

    if task.generate_groundtruth_simulation:
        gt_x = _generate_groundtruth(sim, param_gt)
        loss_info = dataclasses.replace(loss_info, target_x=gt_x)

    return TaskSetup(sim=sim, mask=mask, loss_type=loss_type,
                     loss_info=loss_info, param_gt=param_gt, name=demo)
