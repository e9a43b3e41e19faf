"""PD system-matrix prefactorization as a jittable function of (k, density).

reference: `initializePrefactoredMatrices` (Simulation.cpp:2969-3059) builds
P = M + h^2 A^T A and Cholesky-prefactors it once per parameter change
(`resetSystemWithParams` refactorizes on stiffness/density updates,
Simulation.cpp:3490-3558).

TPU design: the weightless per-type Gram matrices S_t = A0_t^T A0_t are (n,n)
constants on the vertex graph, so

    P(k, rho) = rho * diag(area) + h^2 * sum_t k_t S_t

and its explicit inverse is recomputed on device in one jit call per
optimizer evaluation — no host round-trip, no sparse refactorization, and the
per-iteration "solve" becomes a single (n,n)x(n,3) matmul on the MXU (45.6%
of the reference's forward runtime was spent in prefactored triangular
solves; here it batches over thousands of vmapped rollouts).
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from diffcloth_tpu.geometry import builder as gb


def dense_gram_matrices(scene: "gb.Scene") -> List[np.ndarray]:
    """Per-stage list of per-type Gram matrices [S_spring, S_attach,
    S_stretch, S_bend], each (n,n) float64 (host-side, built once)."""
    n = scene.n
    s_rows = gb.stretch_rows(scene.triangle)
    b_rows = gb.bend_rows(scene.bending)
    sp_rows = gb.spring_rows(scene.springs)
    S_stretch = gb.rows_to_dense_ata(s_rows, n)
    S_bend = gb.rows_to_dense_ata(b_rows, n)
    S_spring = gb.rows_to_dense_ata(sp_rows, n)
    out = []
    for stage in scene.stages:
        a_rows = gb.attach_rows(stage)
        S_attach = gb.rows_to_dense_ata(a_rows, n)
        out.append(np.stack([S_spring, S_attach, S_stretch, S_bend]))
    return out


def gram_diagonals(scene: "gb.Scene") -> List[np.ndarray]:
    """Per-stage (4, n) diag(S_t) — the O(n) substitute for
    dense_gram_matrices on the CG solve path."""
    n = scene.n
    d_stretch = gb.rows_to_ata_diag(gb.stretch_rows(scene.triangle), n)
    d_bend = gb.rows_to_ata_diag(gb.bend_rows(scene.bending), n)
    d_spring = gb.rows_to_ata_diag(gb.spring_rows(scene.springs), n)
    return [np.stack([d_spring, gb.rows_to_ata_diag(gb.attach_rows(st), n),
                      d_stretch, d_bend])
            for st in scene.stages]


def make_host_p_inv_fn(gram_stack: np.ndarray, area: np.ndarray, h: float,
                       dtype):
    """Returns host-side (k_pertype, density) -> P^{-1} for one stage.

    The inverse is computed in NumPy f64 via Cholesky (P is SPD) and cast to
    the device dtype.  Host-side on purpose: it runs once per optimizer
    evaluation (the reference refactorizes its sparse LLT then too), NumPy
    f64 is *more* accurate than an on-device f32 inverse, and XLA:TPU takes
    ~100 s to *compile* `jnp.linalg.inv` even for tiny n.  gram_stack:
    (4, n, n) per-type S_t, float64.
    """
    import scipy.linalg

    h2 = h * h
    eye = np.eye(area.shape[0])

    def p_inv(k_pertype, density):
        k = np.asarray(k_pertype, np.float64)
        P = h2 * np.tensordot(k, gram_stack, axes=1)
        P[np.diag_indices_from(P)] += float(density) * area
        c, low = scipy.linalg.cho_factor(P)
        inv = scipy.linalg.cho_solve((c, low), eye)
        return jnp.asarray(inv, dtype)

    return p_inv


def make_host_p_diag_inv_fn(gram_stack: np.ndarray, area: np.ndarray,
                            h: float, dtype,
                            gram_diags: np.ndarray = None):
    """Jacobi preconditioner for the matrix-free CG solve path
    (n >~ 7k, where the explicit dense P^{-1} stops paying for itself):
    (k_pertype, density) -> 1/diag(P), shape (n,).

    Same refactorization cadence as the dense path (once per optimizer
    evaluation, resetSystemWithParams -> initializePrefactoredMatrices,
    Simulation.cpp:3490-3559) but O(n) data instead of O(n^2).

    `gram_diags` ((4, n), diag of each per-type Gram) can be passed to
    avoid materializing the dense gram_stack for very large meshes."""
    h2 = h * h
    diags = gram_diags if gram_diags is not None else \
        np.stack([np.diagonal(g) for g in gram_stack])

    def p_diag_inv(k_pertype, density):
        k = np.asarray(k_pertype, np.float64)
        d = float(density) * area + h2 * (k @ diags)
        return jnp.asarray(1.0 / d, dtype)

    return p_diag_inv
