"""Differentiable cubic-Hermite control-point trajectories.

reference: simulation/Spline.h (basis :201-243, evaluate :322-330,
splineFromParam :332-378).  All demo splines are single-segment with
startFraction=0, endFraction=1; this module vectorizes evaluation over all
fixed points and exposes the ENDPOINT / ENDPOINT_AND_UP / ENDPOINT_AND_TANGENTS
parameterizations.  Gradients w.r.t. control parameters come from autodiff —
no hand-coded dxfixed_dcontrolPoints (Spline.h:284-320) needed.
"""
from __future__ import annotations

import jax.numpy as jnp

from diffcloth_tpu.config import SplineType


def hermite_basis(t):
    """h00, h10, h01, h11 at t (reference: Spline.h:201-243)."""
    t2 = t * t
    t3 = t2 * t
    h00 = 2 * t3 - 3 * t2 + 1
    h10 = t3 - 2 * t2 + t
    h01 = -2 * t3 + 3 * t2
    h11 = t3 - t2
    return h00, h10, h01, h11


def tangents_from_endpoint(p0, p1, yup):
    """m0/m1 construction for the ENDPOINT(+UP) types (Spline.h:42-45):
    m0 = p1 - p0 + yup * e_y;  m1 = p1 - p0 - yup * e_y."""
    d = p1 - p0
    up = jnp.stack([jnp.zeros_like(yup), yup, jnp.zeros_like(yup)], axis=-1)
    return d + up, d - up


def unpack_params(spline_type: SplineType, params, p0, yup):
    """params: (F, 9) [p1, m0, m1] slots; inactive slots ignored per type."""
    p1 = params[..., 0:3]
    if spline_type == SplineType.ENDPOINT:
        m0, m1 = tangents_from_endpoint(p0, p1, yup)
    elif spline_type == SplineType.ENDPOINT_AND_UP:
        m0, m1 = tangents_from_endpoint(p0, p1, params[..., 3])
    else:  # ENDPOINT_AND_TANGENTS
        m0 = params[..., 3:6]
        m1 = params[..., 6:9]
    return p1, m0, m1


def eval_splines(spline_type: SplineType, params, p0, yup, t_frac):
    """Evaluate all F splines at simulation fraction t_frac (scalar or (...)).

    Returns (..., F, 3)."""
    t = jnp.clip(t_frac, 0.0, 1.0)
    p1, m0, m1 = unpack_params(spline_type, params, p0, yup)
    h00, h10, h01, h11 = hermite_basis(t)
    shape = jnp.shape(t) + (1, 1)
    h00 = jnp.reshape(h00, shape)
    h10 = jnp.reshape(h10, shape)
    h01 = jnp.reshape(h01, shape)
    h11 = jnp.reshape(h11, shape)
    return h00 * p0 + h10 * m0 + h01 * p1 + h11 * m1


def pack_endpoint_tangent_params(p1, m0, m1):
    return jnp.concatenate([p1, m0, m1], axis=-1)


def default_params_from_endpoints(p0, p1, yup):
    """Spline params equivalent to the reference ENDPOINT construction,
    expressed in the 9-dof slot layout."""
    m0, m1 = tangents_from_endpoint(p0, p1, yup)
    return pack_endpoint_tangent_params(p1, m0, m1)
