"""Dense MXU-resident constraint operators.

The reference applies its sparse constraint matrix A with per-element
gather/scatter (OpenMP loops over constraints, Simulation.cpp:1198-1222).
The first TPU port did the same with `segment_sum`-style scatters — and
profiling showed the scatters dominate: on a v5e, one scatter-based
A^T p application costs ~430 us while the (n,n)x(n,3) PD solve matmul costs
~28 us, and the scatter path degrades further under vmap (3.4 ms at B=32).

This module replaces every A-application with dense matmuls:

    y   = A x        -- (R,n)@(n,3)  MXU, batches freely over rollouts
    A^T d            -- (n,R)@(R,3)  MXU (transpose stored explicitly so no
                                     runtime relayout is needed)
    C v = h^2 Sk v   -- Sk = sum_t k_t S_t hoisted once per step, (n,n)@(n,3)

Constraint *projections* are computed from y directly (no vertex gathers):
the stretch rows are sqrt(area)-scaled deformation-gradient columns
(geometry/builder.py stretch_rows; reference Triangle::addConstraint,
Triangle.cpp:287-308), and the polar factor is invariant to that positive
scaling, so the co-rotational projection needs only y. Bending rows are the
sqrt(3/(A0+A1))-scaled cotan sums (TriangleBending::addConstraint), and the
bending projection only needs the direction of that sum
(TriangleBending.cpp:138-151).

Densifying costs O(R*n) memory per operator (~60 MB for the 1.4k-vertex
tshirt) and pays for itself up to a few thousand vertices; larger meshes
(e.g. the 7k-vertex dress) keep the gather/scatter path
(constraints.apply_rows*), selected by `ClothSim(dense_ops=...)`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from diffcloth_tpu.core.constraints import EPS, safe_norm

HI = jax.lax.Precision.HIGHEST


def set_matmul_precision(precision) -> None:
    """Set the MXU precision used by the dense operator matmuls (call
    BEFORE building a ClothSim; baked at trace time).

    'highest' (default): full-f32 passes — bitwise-stable physics.
    'high': bf16x3 passes — measured +47% episode throughput on v5e with
    identical PD convergence (strict eps, same iteration counts); individual
    long-horizon trajectories diverge from the 'highest' ones at the rate
    chaotic dynamics amplify any rounding change, so keep 'highest' when
    comparing trajectories bit-for-bit."""
    global HI
    HI = (getattr(jax.lax.Precision, precision.upper())
          if isinstance(precision, str) else precision)


class DenseOps(NamedTuple):
    """Dense constraint operators for one attachment stage."""
    A_s: jnp.ndarray      # (2T, n) stretch rows (weightless)
    A_sT: jnp.ndarray     # (n, 2T)
    A_b: jnp.ndarray      # (Bn, n) bending rows
    A_bT: jnp.ndarray     # (n, Bn)
    A_a: jnp.ndarray      # (F, n) attachment rows
    A_aT: jnp.ndarray     # (n, F)
    A_sp: jnp.ndarray     # (S, n) spring rows (+1/-1)
    A_spT: jnp.ndarray    # (n, S)
    sp_l0: jnp.ndarray    # (S,) spring rest lengths
    S: jnp.ndarray        # (4, n, n) per-type Gram
    #                       [spring, attach, stretch, bend] = k_pertype order
    tri_sw: jnp.ndarray   # (T,) sqrt(rest area)
    b_scale: jnp.ndarray  # (Bn,) n_rest * sqrt(3/(A0+A1)), 0 where flat


def _rows_to_dense(rows_idx: np.ndarray, rows_w: np.ndarray,
                   n: int) -> np.ndarray:
    R, K = rows_idx.shape
    A = np.zeros((R, n))
    if R:
        np.add.at(A, (np.repeat(np.arange(R), K), rows_idx.reshape(-1)),
                  rows_w.reshape(-1))
    return A


def build_dense_ops(scene_host, stage_host, dtype=jnp.float32) -> DenseOps:
    """Host-side densification of the per-type constraint rows.

    The stretch rows are stored in SPLIT order — all column-0 rows (T), then
    all column-1 rows (T) — instead of the builder's interleaved order, so
    the projection reads each block with a contiguous slice (strided slices
    force lane relayouts on TPU).  A^T A is permutation-invariant, and d_s
    and p_s both use the same split order, so this is purely internal."""
    from diffcloth_tpu.geometry import builder as gb

    n = scene_host.n
    s_rows = gb.stretch_rows(scene_host.triangle)
    b_rows = gb.bend_rows(scene_host.bending)
    a_rows = gb.attach_rows(stage_host)
    sp_rows = gb.spring_rows(scene_host.springs)
    A_s = _rows_to_dense(s_rows.idx, s_rows.w, n)
    T2 = A_s.shape[0]
    perm = np.concatenate([np.arange(0, T2, 2), np.arange(1, T2, 2)])
    A_s = A_s[perm]
    A_b = _rows_to_dense(b_rows.idx, b_rows.w, n)
    A_a = _rows_to_dense(a_rows.idx, a_rows.w, n)
    A_sp = _rows_to_dense(sp_rows.idx, sp_rows.w, n)
    S = np.stack([A_sp.T @ A_sp, A_a.T @ A_a, A_s.T @ A_s, A_b.T @ A_b])
    n_rest = scene_host.bending.n_rest
    sw_b = np.sqrt(3.0 / np.maximum(scene_host.bending.area_sum, 1e-30))
    b_scale = np.where(n_rest <= 1e-6, 0.0, n_rest * sw_b)
    f = lambda a: jnp.asarray(a, dtype)
    return DenseOps(
        A_s=f(A_s), A_sT=f(A_s.T), A_b=f(A_b), A_bT=f(A_b.T),
        A_a=f(A_a), A_aT=f(A_a.T),
        A_sp=f(A_sp), A_spT=f(A_sp.T), sp_l0=f(scene_host.springs.l0),
        S=f(S),
        tri_sw=f(np.sqrt(scene_host.triangle.area)),
        b_scale=f(b_scale))


# ---------------------------------------------------------------------------
# forward operator applications (all MXU matmuls)

def apply_A(dense: DenseOps, x):
    """x (n,3) -> (y_s (2T,3), y_b (Bn,3), y_a (F,3), y_sp (S,3))."""
    y_s = jnp.matmul(dense.A_s, x, precision=HI)
    y_b = jnp.matmul(dense.A_b, x, precision=HI)
    y_a = jnp.matmul(dense.A_a, x, precision=HI)
    y_sp = jnp.matmul(dense.A_sp, x, precision=HI)
    return y_s, y_b, y_a, y_sp


def apply_At(dense: DenseOps, k_pertype, d_s, d_b, d_a, d_sp=None):
    """sum_t k_t A_t^T d_t -> (n,3)."""
    out = k_pertype[2] * jnp.matmul(dense.A_sT, d_s, precision=HI)
    out = out + k_pertype[3] * jnp.matmul(dense.A_bT, d_b, precision=HI)
    out = out + k_pertype[1] * jnp.matmul(dense.A_aT, d_a, precision=HI)
    if d_sp is not None and dense.A_sp.shape[0] > 0:
        out = out + k_pertype[0] * jnp.matmul(dense.A_spT, d_sp,
                                              precision=HI)
    return out


def weighted_S(dense: DenseOps, k_pertype):
    """Sk = sum_t k_t S_t, hoisted once per step outside the PD loop.

    WARNING: under vmap with a batched k_pertype this materializes a
    (B, n, n) matrix — 520 MB at tshirt B=64 — built per step AND re-read
    by every PD iteration's apply_S (the r5 trace's second-largest cost).
    Batched callers must use apply_S_pertype instead."""
    return jnp.tensordot(k_pertype, dense.S, axes=1)


def apply_S(Sk, v):
    """(A^T A) v with stiffness baked into Sk."""
    return jnp.matmul(Sk, v, precision=HI)


def apply_S_pertype(S, k_pertype, v):
    """(sum_t k_t S_t) v as per-type matvecs then a weighted sum.

    The S_t stay UNBATCHED under vmap (shared MXU weights, batched
    activations) — the k contraction happens on the (T, n, 3) matvec
    outputs, so no (B, n, n) matrix ever exists.  Exact same math as
    apply_S(weighted_S(k), v) up to f32 summation order."""
    u = jnp.einsum("tnm,mk->tnk", S, v, precision=HI)
    return jnp.tensordot(k_pertype, u, axes=1)


# ---------------------------------------------------------------------------
# projections from y = A x (gather-free)

def corot_project_cols(a, b):
    """Elementwise co-rotational projection of deformation-gradient columns
    a, b (each (T,3), any positive common scaling) -> projected columns.

    In the Gram-Schmidt frame Q = [q0, q1] built from (a, b), Q^T F is the
    upper-triangular [[|a|, q0.b], [0, |b_perp|]], so the 2x2 polar factor
    (whose determinant is |a||b_perp| >= 0) is closed-form:

        R = [[tr, dq], [-dq, tr]] / sqrt(tr^2 + dq^2),  tr = |a| + |b_perp|

    and p_cols = Q R.  Identical math to polar_2x2(Q^T F) (reference:
    Triangle::projectToManifold, Triangle.cpp:329-351) but with no tiny
    batched matmuls or axis shuffles — pure lane-aligned VPU ops, which is
    ~40x faster on TPU than the einsum formulation at batch."""
    na = safe_norm(a)
    q0 = a / na
    dq = jnp.sum(b * q0, -1, keepdims=True)
    bperp = b - dq * q0
    nb = safe_norm(bperp)
    q1 = bperp / nb
    tr = na + nb
    rnorm = jnp.sqrt(tr * tr + dq * dq + EPS)
    c0 = (q0 * tr - q1 * dq) / rnorm
    c1 = (q0 * dq + q1 * tr) / rnorm
    return c0, c1


def stretch_proj_from_y(y_s, tri_sw):
    """Co-rotational projection from the weighted deformation-gradient rows.

    y_s rows in split order: rows [0,T) = sqrt(area)*F[:,0], rows [T,2T) =
    sqrt(area)*F[:,1].  The polar factor is invariant to the positive
    sqrt(area) scaling, so the projection is computed from y directly."""
    if y_s.shape[0] == 0:
        return y_s
    T = y_s.shape[0] // 2
    c0, c1 = corot_project_cols(y_s[:T], y_s[T:])
    sw = tri_sw.astype(y_s.dtype)[:, None]
    return jnp.concatenate([c0 * sw, c1 * sw], axis=0)


def bend_proj_from_y(y_b, b_scale):
    """p = n_rest * sw * normalize(sum_i w_i x_i); y_b is the sw-scaled sum
    whose direction equals the unscaled one (TriangleBending.cpp:138-151)."""
    if y_b.shape[0] == 0:
        return y_b
    en = safe_norm(y_b)
    return b_scale.astype(y_b.dtype)[:, None] * y_b / en


def spring_proj_from_y(y_sp, sp_l0):
    """p = l0 * normalize(x_i - x_j); y_sp = A_sp x is exactly x_i - x_j
    (Spring::project, Spring.cpp:92-97)."""
    if y_sp.shape[0] == 0:
        return y_sp
    en = safe_norm(y_sp)
    return sp_l0.astype(y_sp.dtype)[:, None] * y_sp / en


def projections_from_y(dense: DenseOps, y_s, y_b, x_fixed, y_sp=None):
    """All weightless projections, computed from y = A x."""
    p_sp = (spring_proj_from_y(y_sp, dense.sp_l0) if y_sp is not None
            else jnp.zeros((0, 3), y_s.dtype))
    return (stretch_proj_from_y(y_s, dense.tri_sw),
            bend_proj_from_y(y_b, dense.b_scale),
            x_fixed, p_sp)
