"""Scatter-free sparse constraint operators for large meshes.

The reference applies A / A^T with per-constraint loops (OpenMP,
Simulation.cpp:1198-1222).  The naive TPU translation uses gathers for A and
scatter-adds for A^T — and scatter-adds are the slowest primitive on TPU
(~430 us per application at tshirt scale vs ~28 us for the PD solve matmul;
see core/dense_ops.py).  Dense MXU operators fix that up to a few thousand
vertices but cost O(R*n) memory, which rules out the ~4k-vertex dress mesh
(reference fabric `dressv7khandsUpDrape`).

This module removes every scatter instead, at O(n*D) memory (D = max vertex
degree, ~10-20):

* **Transpose incidence**: A^T d is computed from the *vertex's* point of
  view — for vertex v, sum_j w[v,j] * d[inc[v,j]] over its incident
  (row, slot) pairs, precomputed host-side and padded to the max degree.
  A pure gather + weighted reduction: lane-aligned VPU work, batches freely
  under vmap.
* **Custom VJPs close the loop**: the VJP of a gather is a scatter, so
  autodiff would reintroduce scatters on the backward pass.  A and A^T are
  linear and mutually transposed, so each is registered as the other's VJP;
  vertex gathers x[idx] used inside the nonlinear projections get the same
  treatment with a unit-weight incidence.

The result: forward PD iterations and the implicit-adjoint fixed-point
iterations (which re-evaluate the residual VJP every sweep,
Simulation.cpp:1569-1599) contain no scatter at any mesh size.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from diffcloth_tpu.core import constraints as cons


def build_incidence(flat_idx: np.ndarray, weights: np.ndarray, n: int):
    """Host-side transpose of a (flattened) index map.

    flat_idx: (M,) vertex index of each source slot; weights: (M,) the
    coefficient each slot contributes to its vertex.  Returns
    (inc_idx (n,D), inc_w (n,D)) padded with (slot 0, weight 0)."""
    M = flat_idx.shape[0]
    if M == 0:
        return (np.zeros((n, 1), np.int32), np.zeros((n, 1)))
    order = np.argsort(flat_idx, kind="stable")
    sorted_v = flat_idx[order]
    counts = np.bincount(sorted_v, minlength=n)
    D = int(counts.max())
    inc_idx = np.zeros((n, D), np.int64)
    inc_w = np.zeros((n, D))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for v in range(n):
        c = counts[v]
        if c:
            sl = order[starts[v]:starts[v] + c]
            inc_idx[v, :c] = sl
            inc_w[v, :c] = weights[sl]
    return inc_idx.astype(np.int32), inc_w


def _apply_inc(inc_idx, inc_w, d_flat):
    """(n,D) incidence applied to flattened source rows (M,3) -> (n,3)."""
    return jnp.einsum("nd,ndk->nk", inc_w.astype(d_flat.dtype),
                      d_flat[inc_idx])


def make_row_ops(rows_idx: np.ndarray, rows_w: np.ndarray, n: int,
                 dtype=jnp.float32):
    """(A, At) for one weightless row block, both scatter-free including
    their VJPs (A and A^T are each other's transpose)."""
    R, K = rows_idx.shape
    flat_v = rows_idx.reshape(-1)
    # slot m = (r, k) contributes w[r,k] to row r from vertex flat_v[m];
    # transposed: vertex v accumulates w * d[r] over incident slots, so the
    # incidence indexes ROWS: slot m -> row m // K
    inc_idx, inc_w = build_incidence(flat_v, rows_w.reshape(-1), n)
    row_of_slot = inc_idx // K if R else inc_idx
    idx_d = jnp.asarray(rows_idx, jnp.int32)
    w_d = jnp.asarray(rows_w, dtype)
    inc_rows = jnp.asarray(row_of_slot, jnp.int32)
    inc_w_d = jnp.asarray(inc_w, dtype)

    @jax.custom_vjp
    def A(x):
        if R == 0:
            return jnp.zeros((0, 3), x.dtype)
        return jnp.einsum("rk,rkd->rd", w_d.astype(x.dtype), x[idx_d])

    @jax.custom_vjp
    def At(d):
        if R == 0:
            return jnp.zeros((n, 3), d.dtype)
        return jnp.einsum("nd,ndk->nk", inc_w_d.astype(d.dtype), d[inc_rows])

    A.defvjp(lambda x: (A(x), None), lambda _, g: (At(g),))
    At.defvjp(lambda d: (At(d), None), lambda _, g: (A(g),))
    return A, At


def make_vertex_gather(idx: np.ndarray, n: int):
    """x -> x[idx] with a scatter-free VJP (unit-weight incidence over the
    flattened gather slots)."""
    shape = idx.shape
    flat = idx.reshape(-1)
    M = flat.shape[0]
    inc_idx, inc_w = build_incidence(flat, np.ones((M,)), n)
    idx_d = jnp.asarray(idx, jnp.int32)
    inc_idx_d = jnp.asarray(inc_idx, jnp.int32)
    inc_w_d = jnp.asarray(inc_w)

    @jax.custom_vjp
    def gather(x):
        return x[idx_d]

    def bwd(_, g):
        return (_apply_inc(inc_idx_d, inc_w_d, g.reshape(M, 3)),)

    gather.defvjp(lambda x: (gather(x), None), bwd)
    return gather


class SparseOps(NamedTuple):
    """Scatter-free operators for one attachment stage (large-mesh path)."""
    A_s: Callable
    At_s: Callable
    A_b: Callable
    At_b: Callable
    A_a: Callable
    At_a: Callable
    A_sp: Callable
    At_sp: Callable
    gather_tri: Callable      # x -> x[tri_idx] (T,3,3)
    gather_bend: Callable     # x -> x[b_idx]  (B,4,3)
    n_rows: tuple             # (2T, B, F, S) row counts


def build_sparse_ops(scene_host, stage_host, dtype=jnp.float32) -> SparseOps:
    from diffcloth_tpu.geometry import builder as gb

    n = scene_host.n
    s_rows = gb.stretch_rows(scene_host.triangle)
    b_rows = gb.bend_rows(scene_host.bending)
    a_rows = gb.attach_rows(stage_host)
    sp_rows = gb.spring_rows(scene_host.springs)
    A_s, At_s = make_row_ops(s_rows.idx, s_rows.w, n, dtype)
    A_b, At_b = make_row_ops(b_rows.idx, b_rows.w, n, dtype)
    A_a, At_a = make_row_ops(a_rows.idx, a_rows.w, n, dtype)
    A_sp, At_sp = make_row_ops(sp_rows.idx, sp_rows.w, n, dtype)
    return SparseOps(
        A_s=A_s, At_s=At_s, A_b=A_b, At_b=At_b, A_a=A_a, At_a=At_a,
        A_sp=A_sp, At_sp=At_sp,
        gather_tri=make_vertex_gather(scene_host.triangle.idx, n),
        gather_bend=make_vertex_gather(scene_host.bending.idx, n),
        n_rows=(s_rows.idx.shape[0], b_rows.idx.shape[0],
                a_rows.idx.shape[0], sp_rows.idx.shape[0]))


# ---------------------------------------------------------------------------
# step.py operator surface (mirrors the dense_ops one)

def apply_A(sp: SparseOps, x):
    return sp.A_s(x), sp.A_b(x), sp.A_a(x), sp.A_sp(x)


def apply_At(sp: SparseOps, k_pertype, d_s, d_b, d_a, d_sp=None):
    out = k_pertype[2] * sp.At_s(d_s)
    out = out + k_pertype[3] * sp.At_b(d_b)
    out = out + k_pertype[1] * sp.At_a(d_a)
    if d_sp is not None and sp.n_rows[3] > 0:
        out = out + k_pertype[0] * sp.At_sp(d_sp)
    return out


def apply_AtA(sp: SparseOps, k_pertype, v):
    """sum_t k_t A_t^T (A_t v): gather both ways, no scatter."""
    out = k_pertype[2] * sp.At_s(sp.A_s(v))
    out = out + k_pertype[3] * sp.At_b(sp.A_b(v))
    out = out + k_pertype[1] * sp.At_a(sp.A_a(v))
    if sp.n_rows[3] > 0:
        out = out + k_pertype[0] * sp.At_sp(sp.A_sp(v))
    return out


def projections(sp: SparseOps, scene, x, x_fixed):
    """All weightless projections at x with scatter-free gather VJPs.
    Same math as constraints.all_projections (reference
    Triangle.cpp:329-351, TriangleBending.cpp:138-151)."""
    from diffcloth_tpu.core.dense_ops import corot_project_cols

    # stretch: co-rotational projection from gathered triangle vertices
    if sp.n_rows[0] > 0:
        verts = sp.gather_tri(x)                     # (T,3,3)
        e1 = verts[:, 1] - verts[:, 0]
        e2 = verts[:, 2] - verts[:, 0]
        u = scene.tri_inv_duv.astype(x.dtype)
        a = e1 * u[:, 0, 0][:, None] + e2 * u[:, 1, 0][:, None]
        b = e1 * u[:, 0, 1][:, None] + e2 * u[:, 1, 1][:, None]
        c0, c1 = corot_project_cols(a, b)
        sw = jnp.sqrt(scene.tri_area).astype(x.dtype)[:, None]
        p_s = jnp.stack([c0 * sw, c1 * sw], axis=1).reshape(-1, 3)
    else:
        p_s = jnp.zeros((0, 3), x.dtype)

    # bending: cotan-hinge from gathered quad vertices
    if sp.n_rows[1] > 0:
        quad = sp.gather_bend(x)                     # (B,4,3)
        e = jnp.einsum("bk,bkd->bd", scene.b_w_vert.astype(x.dtype), quad)
        en = cons.safe_norm(e)
        flat = (scene.b_n_rest <= 1e-6)[:, None]
        p_b = jnp.where(
            flat, 0.0,
            (scene.b_n_rest * scene.b_sw).astype(x.dtype)[:, None] * e / en)
    else:
        p_b = jnp.zeros((0, 3), x.dtype)

    p_sp = cons.project_spring(sp.A_sp(x), scene.sp_l0)
    return p_s, p_b, x_fixed, p_sp
