"""Pallas TPU kernel for self-collision detection.

The XLA formulations of the broad phase (sweep sort or the n x n
pairwise-distance matrix, core/selfcol.py) either serialize on gathers or
materialize O(n^2) HBM buffers per step; profiled on a v5e this costs
~50-120 ms per batched (B=64) detection — vastly more than the PD iteration
matmuls it sits next to.  This kernel streams (BI, BJ) pair tiles through
VMEM and keeps only O(n * K) outputs:

  grid (i_block, j_block):
    skip blocks entirely below the diagonal (pairs are i<j)
    d0^2, d1^2 (BI,BJ) from broadcasted coordinate differences        (VPU)
    hit = (min(d0^2, d1^2) < (r_i + r_j)^2) & allowed[i,j]
    IF the tile has any hit (rare): merge hits into per-row partner
    slots (K columns) with one-hot column selects — K static passes,
    no scatter, no sort
  output: partners (n, 128) int32 — cols 0..K-1 = partner indices (-1 =
    empty), col K = per-row hit count (> K  =>  overflow, bump K)

Tiles are large (512 x 512) so a vmapped batch costs few sequential grid
steps: TPU grids serialize and each grid step carries ~10 us of fixed
overhead regardless of tile work (measured on v5e — the no-hit detection
cost tracked grid-step count, not element count), so the tile size is
bounded by VMEM, not FLOPs.

The swept-contact semantics are the reference's exactly (min distance over
the step below summed radii — Simulation.cpp:194-219 with its tMid == t0
identity; adjacency exclusion via the precomputed table, :319).  The i<j
deduplication is baked into `allowed` (upper-triangular).

reference hot loop being replaced: Simulation.cpp:225-372
(collisionDetection: broad grid + per-pair swept test).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BI = 512          # rows per tile (must divide n_pad = round_up(n, BJ))
BJ = 512          # cols per tile (n_pad is a multiple of BJ)
SLOT_COLS = 128   # output layout: K partner cols + count col, padded


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(geom_ref, allowed_ref, out_ref, slots_ref, count_ref, *,
            k_partners: int, triu_only: bool):
    bi = pl.program_id(1)
    bj = pl.program_id(2)
    nbj = pl.num_programs(2)

    @pl.when(bj == 0)
    def _init():
        slots_ref[:] = jnp.full_like(slots_ref, -1)
        count_ref[:] = jnp.zeros_like(count_ref)

    # triu mode (pair-set extraction): blocks entirely below the diagonal
    # can never hold i<j pairs.  Symmetric mode (partner tables): every
    # block computes — each pair is discovered from BOTH rows, which is
    # what makes the downstream layering/friction gather-only.
    @pl.when((bj * BJ + BJ > bi * BI) if triu_only else (bj >= 0))
    def _compute():
        # geometry tiles: geom rows 0-2 = x, 3-5 = x + h v, 6 = radii
        gi = geom_ref[0, :, pl.ds(bi * BI, BI)]         # (8, BI)
        gj = geom_ref[0, :, pl.ds(bj * BJ, BJ)]         # (8, BJ)

        def pair_d2(row0):
            d2 = jnp.zeros((BI, BJ), jnp.float32)
            for c in range(3):
                diff = gi[row0 + c, :][:, None] - gj[row0 + c, :][None, :]
                d2 = d2 + diff * diff
            return d2

        d2 = jnp.minimum(pair_d2(0), pair_d2(3))
        reach = gi[6, :][:, None] + gj[6, :][None, :]
        hit = (d2 < reach * reach) & (allowed_ref[:].astype(jnp.int32) > 0)

        @pl.when(jnp.any(hit))
        def _merge():
            lane = jax.lax.broadcasted_iota(jnp.int32, (BI, BJ), 1)
            kcol = jax.lax.broadcasted_iota(jnp.int32, (BI, SLOT_COLS), 1)
            slots = slots_ref[:]
            count = count_ref[:, 0:1]                   # (BI, 1)
            masked = jnp.where(hit, d2, jnp.inf)
            for _ in range(k_partners):
                m = jnp.min(masked, axis=1, keepdims=True)        # (BI,1)
                arg = jnp.min(jnp.where(masked <= m, lane, BJ),
                              axis=1, keepdims=True)              # (BI,1)
                ok = jnp.isfinite(m) & (count < k_partners)
                jglob = bj * BJ + arg                             # (BI,1)
                put = ok & (kcol == count)                # one-hot column
                slots = jnp.where(put, jglob, slots)
                count = count + ok.astype(jnp.int32)
                masked = jnp.where(lane == arg, jnp.inf, masked)
            # hits beyond the K slots still count (overflow signal)
            extra = jnp.sum(jnp.isfinite(masked), axis=1,
                            keepdims=True).astype(jnp.int32)
            count = count + extra
            slots_ref[:] = slots
            count_ref[:, 0:1] = count

    @pl.when(bj == nbj - 1)
    def _flush():
        kcol = jax.lax.broadcasted_iota(jnp.int32, (BI, SLOT_COLS), 1)
        out_ref[0] = jnp.where(kcol == k_partners,
                               count_ref[:, 0:1], slots_ref[:])


def _detect_partners_grid(geom_b: jnp.ndarray, allowed: jnp.ndarray,
                          k_partners: int, interpret: bool,
                          triu_only: bool = True) -> jnp.ndarray:
    """Natively batched kernel launch: geom_b (B, 8, n_pad) -> (B, n_pad,
    SLOT_COLS).  The batch is the SLOWEST grid dimension — one kernel, one
    compile, any B.  (Routing vmap through jax's default pallas batching
    instead made XLA's remote compile blow up super-linearly in B: B=64
    compiled in ~2 min, B>=128 did not return within 25 min on v5e.)"""
    B, _, n_pad = geom_b.shape
    assert n_pad % BJ == 0 and n_pad % BI == 0, n_pad
    kernel = functools.partial(_kernel, k_partners=k_partners,
                               triu_only=triu_only)
    return pl.pallas_call(
        kernel,
        grid=(B, n_pad // BI, n_pad // BJ),
        in_specs=[
            pl.BlockSpec((1, 8, n_pad), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BI, BJ), lambda b, i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BI, SLOT_COLS), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, SLOT_COLS), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BI, SLOT_COLS), jnp.int32),   # partner slots
            pltpu.VMEM((BI, SLOT_COLS), jnp.int32),   # per-row count (col 0)
        ],
        interpret=interpret,
    )(geom_b, allowed)


_DETECT_CACHE: dict = {}


def _detect_partners_fn(k_partners: int, interpret: bool,
                        triu_only: bool = True):
    """custom_vmap wrapper, cached per (K, interpret, triu): the
    single-sample call runs the grid kernel at B=1; a vmapped call is
    rewritten to the SAME kernel with the batch as the leading grid
    dimension."""
    key = (k_partners, interpret, triu_only)
    fn = _DETECT_CACHE.get(key)
    if fn is not None:
        return fn

    @jax.custom_batching.custom_vmap
    def detect(geom, allowed):
        return _detect_partners_grid(geom[None], allowed, k_partners,
                                     interpret, triu_only)[0]

    @detect.def_vmap
    def _rule(axis_size, in_batched, geom_b, allowed_b):
        geom_batched, allowed_batched = in_batched
        assert geom_batched and not allowed_batched, (
            "detect_partners batches over geometry only; the admissibility "
            "table is per-topology")
        out = _detect_partners_grid(geom_b, allowed_b, k_partners,
                                    interpret, triu_only)
        return out, True

    _DETECT_CACHE[key] = detect
    return detect


def detect_partners(geom: jnp.ndarray, allowed: jnp.ndarray,
                    k_partners: int = 6,
                    interpret: bool | None = None) -> jnp.ndarray:
    """geom: (8, n_pad) f32 (rows x, x+hv, radii, pad); allowed: (n_pad,
    n_pad) int8 upper-triangular admissibility.  Returns (n_pad, 128) int32:
    cols 0..K-1 partner indices (-1 empty), col K per-row hit count.
    interpret=None compiles the kernel on TPU backends and falls back to
    interpret mode elsewhere (CPU tests), decided at trace time.
    vmap-compatible: batched calls run one natively-batched kernel (batch =
    slowest grid dimension) via a custom_vmap rule."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _detect_partners_fn(k_partners, interpret)(geom, allowed)


def build_geom(x: jnp.ndarray, v: jnp.ndarray, radii: jnp.ndarray,
               h: float, n_pad: int) -> jnp.ndarray:
    """Pack positions / swept positions / radii into the (8, n_pad) kernel
    input.  Padding columns get x = +LARGE (never within reach) and r = 0."""
    n = x.shape[0]
    LARGE = jnp.asarray(1e9, jnp.float32)
    xT = x.astype(jnp.float32).T                      # (3, n)
    pT = (x + h * v).astype(jnp.float32).T
    r = radii.astype(jnp.float32)[None, :]
    pad = n_pad - n
    geom = jnp.concatenate(
        [xT, pT, r, jnp.zeros((1, n), jnp.float32)], axis=0)
    if pad:
        fill = jnp.full((8, pad), 0.0, jnp.float32)
        fill = fill.at[0:6, :].set(LARGE)
        geom = jnp.concatenate([geom, fill], axis=1)
    return geom


def detect_self_collisions_pallas(allowed_i8: jnp.ndarray,
                                  radii: jnp.ndarray,
                                  x: jnp.ndarray, v: jnp.ndarray, h: float,
                                  k_partners: int, cap_pairs: int,
                                  interpret: bool | None = None):
    """Full drop-in for selfcol.detect_self_collisions_matrix backed by the
    Pallas kernel.  `allowed_i8` is the (n_pad, n_pad) int8 triu table."""
    from diffcloth_tpu.core.selfcol import SelfContactSet

    n = x.shape[0]
    n_pad = allowed_i8.shape[0]
    geom = build_geom(x, v, radii, h, n_pad)
    table = detect_partners(geom, allowed_i8, k_partners,
                            interpret=interpret)
    counts = table[:n, k_partners]
    row_overflow = jnp.any(counts > k_partners)

    i = jnp.repeat(jnp.arange(n, dtype=jnp.int32)[:, None], k_partners,
                   axis=1).reshape(-1)
    j = table[:n, :k_partners].reshape(-1)
    valid = j >= 0
    j = jnp.minimum(jnp.maximum(j, 0), n - 1)

    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    tgt = jnp.where(valid & (pos < cap_pairs), pos, cap_pairs)
    p0 = x[i] - x[j]
    nrm_all = p0 / jnp.maximum(
        jnp.linalg.norm(p0, axis=-1, keepdims=True), 1e-12)
    pi = jnp.zeros((cap_pairs,), jnp.int32).at[tgt].set(i, mode="drop")
    pj = jnp.zeros((cap_pairs,), jnp.int32).at[tgt].set(j, mode="drop")
    nrm = jnp.zeros((cap_pairs, 3), x.dtype).at[tgt].set(
        nrm_all.astype(x.dtype), mode="drop")
    mask = jnp.zeros((cap_pairs,), bool).at[tgt].set(True, mode="drop")
    overflow = (jnp.sum(valid) > cap_pairs) | row_overflow
    return SelfContactSet(
        pair_i=pi, pair_j=pj, normal=nrm, mask=mask,
        layer=jnp.full((cap_pairs,), -1, jnp.int32), overflow=overflow)


def pack_allowed(allowed_triu: np.ndarray) -> np.ndarray:
    """(n,n) bool triu admissibility -> padded (n_pad, n_pad) int8."""
    n = allowed_triu.shape[0]
    n_pad = _round_up(n, BJ)
    out = np.zeros((n_pad, n_pad), np.int8)
    out[:n, :n] = allowed_triu.astype(np.int8)
    return out


def detect_tables_pallas(allowed_sym: jnp.ndarray, radii: jnp.ndarray,
                         x: jnp.ndarray, v: jnp.ndarray, h: float,
                         k_partners: int, max_layers: int,
                         interpret: bool | None = None,
                         with_normals: bool = True):
    """Production TPU self-collision pipeline: symmetric kernel detection ->
    dense layering -> per-layer friction tables, scatter-free END TO END.

    `allowed_sym` is the (n_pad, n_pad) int8 SYMMETRIC non-adjacency table
    (pack_allowed on ~conn & ~eye, no triu): every unordered pair is
    discovered from both rows, so the kernel's per-row partner slots are the
    complete contact incidence of each particle and everything downstream
    (layer assignment, table build, friction) is gathers + lane reductions.
    The earlier pair-list pipeline (detect_self_collisions_pallas +
    assign_layers + build_layer_tables) compacts and scatters; TPU lowers
    those duplicate-index scatters to sequential per-index loops, which
    profiled as the dominant per-step contact cost (tools/step_profile.py
    --mode detect).  That path remains the parity/diagnostic oracle.

    Returns (SelfContactTables, overflow) — overflow is True when any
    particle exceeded k_partners contacts (bump K at recompile).

    reference hot loop being replaced: Simulation.cpp:225-372 detection +
    contactSorting :422-624."""
    from diffcloth_tpu.core.selfcol import layer_tables_from_partners

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = x.shape[0]
    n_pad = allowed_sym.shape[0]
    geom = build_geom(x, v, radii, h, n_pad)
    table = _detect_partners_fn(k_partners, interpret, triu_only=False)(
        geom, allowed_sym)
    partners = table[:n, :k_partners]
    counts = table[:n, k_partners]
    overflow = jnp.any(counts > k_partners)
    tables = layer_tables_from_partners(partners, x, max_layers,
                                       with_normals=with_normals)
    return tables, overflow
