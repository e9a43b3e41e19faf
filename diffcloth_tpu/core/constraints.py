"""Batched constraint projection kernels and the A-operator (gather/scatter).

TPU-native replacement for the per-element virtual `Constraint::project`
dispatch (reference: Triangle.cpp:310-351, TriangleBending.cpp:138-151,
AttachmentSpring project).  All elements of a type are projected in one
vectorized kernel; the sparse operator A is applied as fixed-arity
gather/scatter, which XLA fuses and vectorizes on the VPU.

The 2x2 SVD used by the reference for the co-rotational stretch projection
(Eigen::JacobiSVD, Triangle.cpp:345) is replaced by the closed-form 2x2 polar
decomposition — identical result (R = U V^T, det(R) = sign(det F)), cheaper,
and with a numerically benign autodiff path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-12


def safe_norm(v, axis=-1, keepdims=True, eps=EPS):
    """|v| with a NaN-free VJP at v = 0.

    `jnp.linalg.norm(v).clip(eps)` (or maximum(norm, eps)) guards the
    *value* but not the gradient: norm's VJP computes g * v / norm, which is
    0 * 0/0 = NaN at v = 0 even when the clip routes a zero cotangent.  The
    double-where below makes degenerate inputs contribute exactly zero
    gradient instead (matters for stick-regime friction, where the
    tangential force is exactly zero)."""
    n2 = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    safe = n2 > eps * eps
    n = jnp.sqrt(jnp.where(safe, n2, 1.0))
    return jnp.where(safe, n, eps)


# ---------------------------------------------------------------------------
# A0 operator: weightless rows, arbitrary arity K

def apply_rows(rows_idx: jnp.ndarray, rows_w: jnp.ndarray,
               x: jnp.ndarray) -> jnp.ndarray:
    """(A0 x): (R,K) indices, (R,K) weights, (n,3) x -> (R,3)."""
    if rows_idx.shape[0] == 0:
        return jnp.zeros((0, 3), x.dtype)
    gathered = x[rows_idx]                       # (R,K,3)
    return jnp.einsum("rk,rkd->rd", rows_w.astype(x.dtype), gathered)


def apply_rows_t(rows_idx: jnp.ndarray, rows_w: jnp.ndarray,
                 p: jnp.ndarray, n: int) -> jnp.ndarray:
    """(A0^T p): (R,K),(R,K),(R,3) -> (n,3) via scatter-add."""
    out = jnp.zeros((n, 3), p.dtype)
    if rows_idx.shape[0] == 0:
        return out
    contrib = rows_w.astype(p.dtype)[:, :, None] * p[:, None, :]  # (R,K,3)
    return out.at[rows_idx.reshape(-1)].add(
        contrib.reshape(-1, 3), mode="drop")


# ---------------------------------------------------------------------------
# stretch: co-rotational triangle projection

def polar_2x2(F: jnp.ndarray) -> jnp.ndarray:
    """Closed-form polar factor R of a 2x2 matrix (batch ...x2x2).

    R = U V^T from the SVD of F; for 2x2 this is the normalization of
    F + sign(det F) * adj(F)^T, whose columns are orthogonal with equal norm.
    Matches Eigen::JacobiSVD's U*V^T including det(R) = sign(det F)
    (reference: Triangle.cpp:344-349)."""
    a, b = F[..., 0, 0], F[..., 0, 1]
    c, d = F[..., 1, 0], F[..., 1, 1]
    det = a * d - b * c
    s = jnp.sign(det)
    s = jnp.where(s == 0, 1.0, s).astype(F.dtype)
    g00 = a + s * d
    g01 = b - s * c
    g10 = c - s * b
    g11 = d + s * a
    norm = jnp.sqrt(g00 * g00 + g10 * g10 + EPS)
    R = jnp.stack([jnp.stack([g00, g01], -1),
                   jnp.stack([g10, g11], -1)], -2)
    return R / norm[..., None, None]


def project_stretch(x: jnp.ndarray, tri_idx: jnp.ndarray,
                    inv_duv: jnp.ndarray, area: jnp.ndarray) -> jnp.ndarray:
    """Weightless stretch projections, (2T,3) matching the stretch A0 rows.

    reference: Triangle::projectToManifold (Triangle.cpp:329-351) —
    deformation gradient F = [x1-x0, x2-x0] @ inv_duv (3x2), in-plane frame Q
    by Gram-Schmidt of current edges, R = polar(Q^T F), p = Q R.
    Weightless scale = sqrt(area_rest) (project() multiplies by
    constrainWeightSqrt = sqrt(area*k), Triangle.cpp:310-316; k applied on
    device by the caller)."""
    if tri_idx.shape[0] == 0:
        return jnp.zeros((0, 3), x.dtype)
    from diffcloth_tpu.core.dense_ops import corot_project_cols
    p0 = x[tri_idx[:, 0]]
    p1 = x[tri_idx[:, 1]]
    p2 = x[tri_idx[:, 2]]
    e1 = p1 - p0                                 # (T,3)
    e2 = p2 - p0
    u = inv_duv.astype(x.dtype)
    # deformation-gradient columns F[:, i] = e1*u[0,i] + e2*u[1,i]
    a = e1 * u[:, 0, 0][:, None] + e2 * u[:, 1, 0][:, None]
    b = e1 * u[:, 0, 1][:, None] + e2 * u[:, 1, 1][:, None]
    # co-rotational projection in the current-configuration frame
    # (Triangle.cpp:338-349); closed-form polar, see corot_project_cols
    c0, c1 = corot_project_cols(a, b)
    sw = jnp.sqrt(area).astype(x.dtype)[:, None]
    # rows interleave: for triangle t, row 2t = column 0, row 2t+1 = column 1
    p = jnp.stack([c0 * sw, c1 * sw], axis=1)    # (T,2,3)
    return p.reshape(-1, 3)


# ---------------------------------------------------------------------------
# spring (per-edge length) projection

def project_spring(y_sp: jnp.ndarray, l0: jnp.ndarray) -> jnp.ndarray:
    """p = l0 * normalize(x_i - x_j) from the spring rows y = A_sp x
    (reference: Spring::project, Spring.cpp:92-97; weight sqrt(k) applied
    per-type by the caller)."""
    if y_sp.shape[0] == 0:
        return y_sp
    en = safe_norm(y_sp)
    return l0.astype(y_sp.dtype)[:, None] * y_sp / en


# ---------------------------------------------------------------------------
# bending: cotan hinge projection

def project_bend(x: jnp.ndarray, b_idx: jnp.ndarray, w_vert: jnp.ndarray,
                 n_rest: jnp.ndarray, sw: jnp.ndarray) -> jnp.ndarray:
    """Weightless bending projections, (B,3).

    reference: TriangleBending::project (TriangleBending.cpp:138-151):
    e = sum_i w_i x_i, p = n_rest * normalize(e) (0 when n_rest <= 1e-6).
    Weightless scale sw = sqrt(3/(A0+A1))."""
    if b_idx.shape[0] == 0:
        return jnp.zeros((0, 3), x.dtype)
    e = jnp.einsum("bk,bkd->bd", w_vert.astype(x.dtype), x[b_idx])   # (B,3)
    en = safe_norm(e)
    flat = (n_rest <= 1e-6)[:, None]
    p = jnp.where(flat, 0.0, (n_rest * sw).astype(x.dtype)[:, None] * e / en)
    return p


# ---------------------------------------------------------------------------
# per-type operator bundles

def apply_AtA(scene, stage, k_pertype, v):
    """sum_t k_t * A0_t^T (A0_t v) — the weighted Gauss map A^T A v in
    operator form so that d/dk flows (reference keeps per-type weightless
    A^T A products for exactly this purpose, Simulation.cpp:3011)."""
    n = v.shape[0]
    out = k_pertype[2] * apply_rows_t(
        scene.s_rows_idx, scene.s_rows_w,
        apply_rows(scene.s_rows_idx, scene.s_rows_w, v), n)
    out = out + k_pertype[3] * apply_rows_t(
        scene.b_rows_idx, scene.b_rows_w,
        apply_rows(scene.b_rows_idx, scene.b_rows_w, v), n)
    out = out + k_pertype[1] * apply_rows_t(
        stage.attach_idx, stage.attach_w,
        apply_rows(stage.attach_idx, stage.attach_w, v), n)
    if scene.sp_rows_idx.shape[0] > 0:
        out = out + k_pertype[0] * apply_rows_t(
            scene.sp_rows_idx, scene.sp_rows_w,
            apply_rows(scene.sp_rows_idx, scene.sp_rows_w, v), n)
    return out


def apply_At_p(scene, stage, k_pertype, p_stretch, p_bend, p_attach, n,
               p_spring=None):
    """A^T p with weighted projections: sum_t k_t * A0_t^T p0_t."""
    out = k_pertype[2] * apply_rows_t(scene.s_rows_idx, scene.s_rows_w,
                                      p_stretch, n)
    out = out + k_pertype[3] * apply_rows_t(scene.b_rows_idx, scene.b_rows_w,
                                            p_bend, n)
    out = out + k_pertype[1] * apply_rows_t(stage.attach_idx, stage.attach_w,
                                            p_attach, n)
    if p_spring is not None and scene.sp_rows_idx.shape[0] > 0:
        out = out + k_pertype[0] * apply_rows_t(
            scene.sp_rows_idx, scene.sp_rows_w, p_spring, n)
    return out


def all_projections(scene, stage, x, x_fixed):
    """Compute all weightless projections at configuration x.
    Returns (p_stretch, p_bend, p_attach, p_spring)."""
    p_s = project_stretch(x, scene.tri_idx, scene.tri_inv_duv, scene.tri_area)
    p_b = project_bend(x, scene.b_rows_idx, scene.b_w_vert, scene.b_n_rest,
                       scene.b_sw)
    p_a = x_fixed  # AttachmentSpring::project = weight * fixed position
    p_sp = project_spring(
        apply_rows(scene.sp_rows_idx, scene.sp_rows_w, x), scene.sp_l0)
    return p_s, p_b, p_a, p_sp
