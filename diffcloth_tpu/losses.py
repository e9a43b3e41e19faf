"""Task loss library — all eight reference loss types as differentiable
functions of the stacked episode records.

reference: `Simulation::calculateLossAndGradient` (Simulation.cpp:3238-3488).
Analytic dL/dx, dL/dv are unnecessary here: each loss is a plain jnp function
of the (N+1, n, 3) trajectories and autodiff injects per-frame cotangents
into the scan reverse pass exactly where the reference adds dL_dxinit /
dL_dvinit (Simulation.cpp:3948).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffcloth_tpu.config import LossType
from diffcloth_tpu.core.types import EpisodeRecords


@dataclasses.dataclass(frozen=True)
class LossInfo:
    """reference: Simulation.h LossInfo (:247-256).  Targets are host
    numpy/jnp arrays captured at task-setup time."""
    target_x: Optional[jnp.ndarray] = None          # (N+1, n, 3)
    target_v: Optional[jnp.ndarray] = None          # (N+1, n, 3)
    target_frame_shape: Tuple[Tuple[int, jnp.ndarray], ...] = ()
    target_translation: Optional[jnp.ndarray] = None  # (3,)
    x_init: Optional[jnp.ndarray] = None            # (n,3) for WITH_TRANSLATION
    target_twirl_height: float = 0.0
    loop_points: Optional[jnp.ndarray] = None       # (L,) int32
    rest_min: Optional[jnp.ndarray] = None
    rest_max: Optional[jnp.ndarray] = None
    rest_mid: Optional[jnp.ndarray] = None
    # ASSISTED_DRESSING_KEYPOINTS: per keypoint (frame_idx, target_pos,
    # candidate particle indices padded to equal length with -1)
    keypoint_frames: Optional[jnp.ndarray] = None   # (K,) int32
    keypoint_targets: Optional[jnp.ndarray] = None  # (K,3)
    keypoint_candidates: Optional[jnp.ndarray] = None  # (K,C) int32, -1 pad
    # tau > 0 replaces the hard max over candidates with a softmax-weighted
    # mean (temperature tau, units of squared distance).  The hard max has a
    # piecewise-constant active set, so on plateaus the subgradient sees only
    # one candidate per keypoint; the smoothed loss -> the hard max as
    # tau -> 0.  Optimization smoothing only — the reference's loss
    # (Simulation.cpp:3440-3475) is the tau=0 case.
    keypoint_tau: float = 0.0


def match_trajectory(recs: EpisodeRecords, info: LossInfo):
    """L = 1/(N*n) sum_i |x_i - x*_i|^2 over frames 0..N
    (Simulation.cpp:3247-3278).  target_x has N+1 frames; frame 0 compares
    against the (possibly optimized) initial positions."""
    N = recs.steps.x.shape[0] + 1
    n = recs.steps.x.shape[1]
    k = 1.0 / (N * n)
    tgt = info.target_x.astype(recs.steps.x.dtype)
    d0 = recs.x0 - tgt[0]
    d = recs.steps.x - tgt[1:]
    return k * (jnp.sum(d * d) + jnp.sum(d0 * d0))


def match_velocity(recs: EpisodeRecords, info: LossInfo):
    """Simulation.cpp:3280-3311."""
    N = recs.steps.v.shape[0] + 1
    n = recs.steps.v.shape[1]
    k = 1.0 / (N * n)
    tgt = info.target_v.astype(recs.steps.v.dtype)
    d0 = recs.v0 - tgt[0]
    d = recs.steps.v - tgt[1:]
    return k * (jnp.sum(d * d) + jnp.sum(d0 * d0))


def match_trajectory_max(recs: EpisodeRecords, info: LossInfo):
    """Max-over-frames variant (Simulation.cpp:3313-3341)."""
    n = recs.steps.x.shape[1]
    tgt = info.target_x.astype(recs.steps.x.dtype)
    d = recs.steps.x - tgt[1:]
    per_frame = jnp.sum(d * d, axis=(1, 2)) / n
    d0 = jnp.sum((recs.x0 - tgt[0]) ** 2) / n
    return jnp.maximum(jnp.max(per_frame), d0)


def dress_angle(recs: EpisodeRecords, info: LossInfo):
    """Twirl-height loss on the dress hem loop points
    (Simulation.cpp:3343-3376)."""
    target_h = info.rest_min[1] + \
        (info.rest_max[1] - info.rest_min[1]) * info.target_twirl_height
    pts = recs.steps.x[-1][info.loop_points]    # (L,3)
    k = 1.0 / info.loop_points.shape[0]
    dy = pts[:, 1] - target_h
    return k * jnp.sum(dy * dy)


def matchshape_translation_invariant(recs: EpisodeRecords, info: LossInfo):
    """Translation-free last-frame shape match (Simulation.cpp:3378-3402)."""
    n = recs.steps.x.shape[1]
    tgt = info.target_x if info.target_x.ndim == 2 else info.target_x[-1]
    tgt = tgt - tgt[0:1]
    last = recs.steps.x[-1]
    cur = last - last[0:1]
    d = cur - tgt.astype(cur.dtype)
    return jnp.sum(d * d) / n


def multistep_matchshape(recs: EpisodeRecords, info: LossInfo):
    """Per-chosen-frame shape targets (Simulation.cpp:3404-3420)."""
    n = recs.steps.x.shape[1]
    L = 0.0
    for frame_idx, shape in info.target_frame_shape:
        cur = recs.x0 if frame_idx == 0 else recs.steps.x[frame_idx - 1]
        d = cur - shape.astype(cur.dtype)
        L = L + jnp.sum(d * d) / n
    return L


def matchshape_with_translation(recs: EpisodeRecords, info: LossInfo):
    """x_target = x_init + translation, matched at the last frame
    (Simulation.cpp:3422-3438)."""
    n = recs.steps.x.shape[1]
    last = recs.steps.x[-1]
    tgt = info.x_init.astype(last.dtype) + \
        info.target_translation.astype(last.dtype)[None, :]
    d = last - tgt
    return jnp.sum(d * d) / n


def assisted_dressing_keypoints(recs: EpisodeRecords, info: LossInfo):
    """Max-distance keypoint matching (Simulation.cpp:3440-3475): for each
    (frame, target, candidate set), penalize the *farthest* candidate.
    Keypoint frames are always >= 1 in the demos (sock uses 0.62N..N)."""
    K = info.keypoint_frames.shape[0]
    xs = recs.steps.x[info.keypoint_frames - 1]            # (K, n, 3)
    cand = info.keypoint_candidates                        # (K, C)
    valid = cand >= 0
    pos = jnp.take_along_axis(
        xs, jnp.maximum(cand, 0)[:, :, None], axis=1)      # (K, C, 3)
    d2 = jnp.sum((pos - info.keypoint_targets[:, None, :].astype(
        pos.dtype)) ** 2, axis=-1)                         # (K, C)
    d2 = jnp.where(valid, d2, -jnp.inf)
    if info.keypoint_tau > 0.0:
        tau = jnp.asarray(info.keypoint_tau, d2.dtype)
        w = jax.nn.softmax(d2 / tau, axis=1)       # -inf pads get weight 0
        return jnp.sum(w * jnp.where(valid, d2, 0.0)) / K
    return jnp.sum(jnp.max(d2, axis=1)) / K


_DISPATCH = {
    LossType.MATCH_TRAJECTORY: match_trajectory,
    LossType.MATCH_VELOCITY: match_velocity,
    LossType.MATCH_TRAJECTORY_MAX: match_trajectory_max,
    LossType.DRESS_ANGLE: dress_angle,
    LossType.MATCHSHAPE_TRANSLATION_INVARIANT: matchshape_translation_invariant,
    LossType.MULTISTEP_MATCHSHAPE: multistep_matchshape,
    LossType.MATCHSHAPE_WITH_TRANSLATION: matchshape_with_translation,
    LossType.ASSISTED_DRESSING_KEYPOINTS: assisted_dressing_keypoints,
}


def make_loss_fn(loss_type: LossType, info: LossInfo
                 ) -> Callable[[EpisodeRecords], jnp.ndarray]:
    fn = _DISPATCH[loss_type]
    return lambda recs: fn(recs, info)
