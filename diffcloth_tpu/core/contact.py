"""Obstacle contact: analytic primitive tests + dry-friction projection.

TPU-native replacement for the reference's virtual `Primitive::isInContact`
dispatch (Primitive.cpp:67-130 plane, :221-261 sphere, :570-602 capsule) and
the Signorini–Coulomb friction projection
(`calcualteDryFrictionForce`, Simulation.cpp:829-862).

Primitives are described by a fixed-size array-of-structs so that one
vectorized kernel tests every particle against every primitive.  The contact
set produced here is FROZEN for a whole PD step (detection happens once, at
iteration 0 — Simulation.cpp:1254) which is what makes a fixed-shape masked
representation exact, not an approximation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# primitive type codes
P_SPHERE = 0
P_PLANE = 1
P_CAPSULE = 2
P_BOWL = 3


class PrimitiveSet(NamedTuple):
    """Array-of-structs for up to P primitives (static scene data).

    `kind`, `rotates`, `enabled` are host numpy — they select Python-level
    code paths at trace time and must stay concrete."""
    kind: np.ndarray         # (P,) int32 (HOST)
    center: jnp.ndarray      # (P,3) pose at t=0 (kinematic prims advance)
    velocity: jnp.ndarray    # (P,3)
    radius: jnp.ndarray      # (P,) sphere/capsule/bowl radius
    length: jnp.ndarray      # (P,) capsule length
    axis_rot: jnp.ndarray    # (P,3,3) rotation: capsule local -> world
    plane_normal: jnp.ndarray  # (P,3)
    plane_upper_left: jnp.ndarray   # (P,3) relative to center
    plane_upper_right: jnp.ndarray  # (P,3)
    rotates: np.ndarray      # (P,) bool (HOST) — rotating-sphere field
    mu: jnp.ndarray          # (P,) default friction (used unless optimized)
    enabled: np.ndarray      # (P,) bool (HOST)
    kinematic: object = None  # (P,) bool (HOST) — advance center by
    #                           velocity; None == all static


def empty_primitive_set(dtype=jnp.float32) -> PrimitiveSet:
    z = lambda *s: jnp.zeros(s, dtype)
    return PrimitiveSet(
        kind=np.zeros((0,), np.int32), center=z(0, 3), velocity=z(0, 3),
        radius=z(0), length=z(0), axis_rot=jnp.zeros((0, 3, 3), dtype),
        plane_normal=z(0, 3), plane_upper_left=z(0, 3),
        plane_upper_right=z(0, 3), rotates=np.zeros((0,), bool),
        mu=z(0), enabled=np.zeros((0,), bool),
        kinematic=np.zeros((0,), bool))


def prims_at_time(prims: PrimitiveSet, t) -> PrimitiveSet:
    """Kinematic primitive stepping in closed form: center(t) = c0 + t * v
    for primitives marked kinematic (reference: Primitive::step advances
    center += h * velocity each frame when !isStatic, Primitive.h:129-136,
    driven by stepPrimitives, Simulation.cpp:954-960 / 1081.  NOTE the
    reference's non-static path advances the center a second time inside
    step() at Simulation.cpp:1143-1150 — a double-advance no demo exercises;
    this implementation uses the single-advance semantics the code intends).

    Static primitives (the default) are untouched, so scenes without
    kinematic obstacles trace to the identical graph as before."""
    if (prims.kind.shape[0] == 0 or prims.kinematic is None
            or not bool(np.any(prims.kinematic))):
        return prims
    kin = jnp.asarray(prims.kinematic)[:, None]
    center_t = prims.center + jnp.where(kin, t * prims.velocity, 0.0)
    return prims._replace(center=center_t)


class ContactSet(NamedTuple):
    """Frozen per-particle obstacle-contact data for one step."""
    mask: jnp.ndarray      # (n,) bool
    normal: jnp.ndarray    # (n,3)
    v_out: jnp.ndarray     # (n,3)
    prim_id: jnp.ndarray   # (n,) int32 (0 when no contact — masked)


def _safe_normalize(v, eps=1e-12):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def _sphere_test(prims: PrimitiveSet, j, pos):
    """reference: Sphere::isInContact (Primitive.cpp:221-261);
    COLLISION_EPSILON = 0.1; rotating spheres add (0,1,0) x n * 8 to v_out."""
    rel = pos - prims.center[j]
    dist = jnp.linalg.norm(rel, axis=-1) - prims.radius[j]
    normal = _safe_normalize(rel)
    hit = dist < 0.1
    if bool(prims.rotates[j]):
        v_out = prims.velocity[j] + \
            jnp.cross(jnp.array([0.0, 1.0, 0.0], pos.dtype), normal) * 8.0
    else:
        v_out = jnp.broadcast_to(prims.velocity[j], pos.shape)
    return hit, normal, dist, v_out


def _plane_test(prims: PrimitiveSet, j, pos):
    """reference: Plane::isInContact (Primitive.cpp:67-130).
    Bounded rectangle; COLLISION_EPSILON = 0.4, thickness 5.  The rare
    edge-tolerance branch (edgeTol=5e-4, :106-127) is dropped — it fires only
    within half a millimetre of the rectangle border."""
    rel = pos - prims.center[j]
    nrm = prims.plane_normal[j]
    d = jnp.einsum("...d,d->...", rel, nrm)
    ul = prims.plane_upper_left[j]
    ur = prims.plane_upper_right[j]
    # in-plane coordinates along the two (orthogonal-ish) half-edges
    proj = rel - d[..., None] * nrm
    eu = _safe_normalize(ul + ur)   # not exact for skewed planes; demo planes
    ev = _safe_normalize(ur - ul)   # are rectangles so this is exact
    half_u = jnp.abs(jnp.dot(ul + ur, eu)) / 2 + jnp.abs(jnp.dot(ul - ur, eu)) / 2
    half_v = jnp.abs(jnp.dot(ur - ul, ev)) / 2 + jnp.abs(jnp.dot(ur + ul, ev)) / 2
    cu = jnp.einsum("...d,d->...", proj, eu)
    cv = jnp.einsum("...d,d->...", proj, ev)
    inside = (jnp.abs(cu) <= half_u) & (jnp.abs(cv) <= half_v)
    hit = inside & (jnp.abs(d) <= 0.4)
    normal = jnp.where((d < -0.4)[..., None], -nrm, nrm) * jnp.ones_like(pos)
    return hit, normal, d, jnp.broadcast_to(prims.velocity[j], pos.shape)


def _capsule_test(prims: PrimitiveSet, j, pos):
    """Point-vs-capsule (reference: Capsule::isInContact,
    Primitive.cpp:570-602): segment from the base (prims.center) along
    globalRotation * (0, length, 0); the body/top-cap distances use
    radius + 0.1 while the bottom cap uses the bare radius, the parameter
    acceptance window extends r/L beyond both ends, and contact fires at
    dist < 0.1 — replicated exactly."""
    L = prims.length[j]
    r = prims.radius[j]
    rot = prims.axis_rot[j]
    base = prims.center[j]
    tip = rot @ (jnp.array([0.0, 1.0, 0.0], pos.dtype) * L)
    rel = pos - base                                   # posLocal
    t = jnp.einsum("...d,d->...", rel, tip) / jnp.maximum(
        jnp.sum(tip * tip), 1e-30)                     # fraction along seg
    in_window = (t >= -r / L) & (t <= 1.0 + r / L)
    d_bot = jnp.linalg.norm(rel, axis=-1) - r
    d_top = jnp.linalg.norm(rel - tip, axis=-1) - (r + 0.1)
    proj = jnp.clip(t, 0.0, 1.0)[..., None] * tip
    d_body = jnp.linalg.norm(rel - proj, axis=-1) - (r + 0.1)
    dist = jnp.where(t < 0.0, d_bot, jnp.where(t > 1.0, d_top, d_body))
    nvec = jnp.where((t < 0.0)[..., None], rel,
                     jnp.where((t > 1.0)[..., None], rel - tip, rel - proj))
    hit = in_window & (dist < 0.1)
    return hit, _safe_normalize(nvec), dist, jnp.broadcast_to(
        prims.velocity[j], pos.shape)


def _bowl_test(prims: PrimitiveSet, j, pos):
    """reference: Bowl::isInContact (Primitive.cpp:360-379), replicated
    exactly: contact iff the point lies (a) inside the sphere up to
    COLLISION_EPSILON = 0.005, (b) in the LOWER half (pos.y <= center.y),
    and (c) within EPSILON of the shell (|pos-c| > r - eps) — i.e. a thin
    lower-hemisphere shell, not the whole interior.  Normal points inward
    (center - pos, normalized); dist = |pos-c| - r."""
    EPS_BOWL = 0.005
    rel = pos - prims.center[j]
    rn = jnp.linalg.norm(rel, axis=-1)
    dist = rn - prims.radius[j]
    normal = -_safe_normalize(rel)
    lower = pos[..., 1] <= prims.center[j, 1]
    hit = (dist <= EPS_BOWL) & lower & (rn > prims.radius[j] - EPS_BOWL)
    return hit, normal, dist, jnp.broadcast_to(prims.velocity[j], pos.shape)


_TESTS = [_sphere_test, _plane_test, _capsule_test, _bowl_test]


def detect_obstacle_contacts(prims: PrimitiveSet, x: jnp.ndarray,
                             v: jnp.ndarray, h: float,
                             t=None) -> ContactSet:
    """Per-particle first-hit test against every primitive at t, t+h/2, t+h
    (reference: isInContactWithObstacle, Simulation.cpp:153-191; the first
    colliding primitive in index order wins).  `t` (simulation time of the
    step being produced) advances kinematic primitives; omit for static
    scenes."""
    n = x.shape[0]
    P = prims.kind.shape[0]
    mask = jnp.zeros((n,), bool)
    normal = jnp.zeros_like(x)
    v_out = jnp.zeros_like(x)
    prim_id = jnp.zeros((n,), jnp.int32)
    if P == 0:
        return ContactSet(mask, normal, v_out, prim_id)
    if t is not None:
        prims = prims_at_time(prims, t)
    for j in range(P):  # static unroll over the (few) primitives
        kind = int(prims.kind[j])
        test = _TESTS[kind]
        hit_any = jnp.zeros((n,), bool)
        nrm_j = jnp.zeros_like(x)
        vout_j = jnp.zeros_like(x)
        for dt in (0.0, 0.5 * h, h):  # swept three-sample test
            hit, nrm, _, vo = test(prims, j, x + v * dt)
            take = hit & (~hit_any)
            nrm_j = jnp.where(take[:, None], nrm, nrm_j)
            vout_j = jnp.where(take[:, None], vo, vout_j)
            hit_any = hit_any | hit
        if not bool(prims.enabled[j]):
            continue
        new = hit_any & (~mask)   # earlier primitive wins
        mask = mask | new
        normal = jnp.where(new[:, None], nrm_j, normal)
        v_out = jnp.where(new[:, None], vout_j, v_out)
        prim_id = jnp.where(new, j, prim_id)
    return ContactSet(mask, normal, v_out, prim_id)


# ---------------------------------------------------------------------------
# dry friction (Signorini–Coulomb projection)

def dry_friction_force(normal, d, mu):
    """r(n, d, mu) — take-off / stick / slide case split
    (reference: calcualteDryFrictionForce, Simulation.cpp:829-862).
    Batched over leading dims; written with double-where so autodiff through
    the slide branch is NaN-free."""
    from diffcloth_tpu.core.constraints import safe_norm
    sd = jnp.sum(d * normal, axis=-1, keepdims=True)      # signed normal mag
    fN = normal * sd
    fT = d - fN
    tnorm = safe_norm(fT)   # NaN-free VJP at fT = 0 (stick regime)
    t_hat = fT / tnorm
    in_contact = sd < 0.0
    stick = tnorm <= mu[..., None] * jnp.abs(sd)
    r_stick = -fN - fT
    r_slide = -fN - mu[..., None] * jnp.abs(sd) * t_hat
    r = jnp.where(stick, r_stick, r_slide)
    return jnp.where(in_contact, r, 0.0)


def obstacle_friction(f, contact: ContactSet, mass, mu_prims):
    """Layer-0 obstacle friction: r_i = friction(n_i, f_i - m_i v_out, mu)
    (reference: calculateDryFrictionVector, Simulation.cpp:639-651)."""
    d = f - mass[:, None] * contact.v_out
    mu = mu_prims[contact.prim_id]
    r = dry_friction_force(contact.normal, d, mu)
    return jnp.where(contact.mask[:, None], r, 0.0)
