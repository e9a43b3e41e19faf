"""Pallas TPU kernels for the layered self-friction application — forward
AND transposed-linearization backward.

The r4 on-chip bisection isolated the ENTIRE full-contact slowdown (B=64
tshirt: 380 vs 5190 steps/s) in the per-PD-iteration self-friction, and
measured it IMPLEMENTATION-INDEPENDENT across dense gathers, XLA one-hot
matmuls and the first in-VMEM kernel.  The r5 diagnosis: all three pay an
MXU *weight-load* cost proportional to the one-hot area — a (n_pad, 2C)
select matrix is ~50 128x128 weight tiles at C=256, streamed with only
M=8 useful activation rows, so each layer costs ~10 us/sample regardless
of how few contacts exist.  Real rollouts have ~20-77 active pairs in 0-3
populated layers (tools/friction_profile.py) against a 4x256-slot budget:
>90 % of the streamed one-hot columns are empty.

This kernel makes the cost proportional to the CONTACTS, not the budget:

  * per-layer slot budgets are the SAME tapered tuple the XLA compact
    path uses (forward and the residual VJP drop identically — the r4
    uniform-budget kernel could disagree with the residual's tapered
    rebuild and silently corrupt gradients);
  * per-layer active-slot counts ride in SMEM; the kernel skips empty
    128-slot column chunks and empty layers entirely (lax.cond), so a
    contact-free step costs two (8, n_pad) VMEM copies and nothing else;
  * the backward kernel applies the TRANSPOSED linearization of the
    layered Gauss-Seidel sweep (reverse layer order, per-slot 3x3
    friction Jacobians from saved select values) with the same chunk
    skipping — this is the matvec the implicit-adjoint fixed point
    applies 10-400 times per step (step.py step_bwd), previously the
    dominant backward cost via XLA one-hot matmuls.

`self_friction_kernel` is a `jax.custom_vjp` function: the forward PD
loop and the custom-VJP residual call the SAME function, so forward and
backward friction agree by construction.  Slot physics (reduced masses)
are computed OUTSIDE the kernel from density so dL/d(density) chains
through plain XLA math; the kernel returns cotangents for the slot-space
(k_red, 1/m_row, 1/m_part) inputs.

Math is op-for-op `selfcol.self_friction_compact` (same slot semantics,
same dry_friction_force case split, same safe_norm guard), tested to f32
rounding in both values and VJPs (tests/test_selfcol_sweep.py).

reference: calculateDryFrictionVector (Simulation.cpp:627-682);
dr_df layer chain rule (Simulation.cpp:686-768).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MU_CLOTH = 0.1
EPS = 1e-12       # constraints.EPS (safe_norm guard)
CHUNK = 128       # lane-aligned slot chunk
# One-hot contractions are single products per output, but Mosaic's f32 dot
# rounds INPUTS to bf16 (one MXU pass) — ~0.3% on the selected values and
# friction forces.  This matches the r4 production kernel (conv 1.0,
# RMSE-validated) and keeps one MXU pass per one-hot tile; interpret mode
# (CPU tests) is exact f32 either way.  DIFFCLOTH_FRIC_KERNEL_PRECISION=
# HIGHEST opts into exact multi-pass selects (measured: Mosaic compile
# stalls at tshirt scale — keep DEFAULT).
import os as _os
_DOT_PREC = getattr(
    jax.lax.Precision,
    _os.environ.get("DIFFCLOTH_FRIC_KERNEL_PRECISION", "DEFAULT").upper())


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def layer_specs(budgets: tuple):
    """Static per-layer (start, c_pad, c_eff) in the concatenated slot
    axis.  c_eff is the DROP budget (identical to the compact path's);
    c_pad rounds it up to the 128-lane chunk."""
    specs = []
    start = 0
    for c_eff in budgets:
        c_pad = _round_up(max(int(c_eff), 1), CHUNK)
        specs.append((start, c_pad, int(c_eff)))
        start += c_pad
    return tuple(specs), start      # (specs, total padded slots)


class KernelGeom(NamedTuple):
    """Density-INDEPENDENT per-step slot geometry for the friction kernels
    (built once per step from the layer partner tables; ~15 KB per sample
    — small enough to live in the step's VJP residuals directly, unlike
    the (n, C) one-hot matrices of the XLA compact path).

    All slot axes are the concatenated per-layer padded axis of
    `layer_specs(budgets)`.  Index arrays travel as float32 so the whole
    custom-VJP signature is float (exact for n <= 2^24)."""
    idx_row: jnp.ndarray    # (TC,) f32 row vertex index, -1 empty
    idx_part: jnp.ndarray   # (TC,) f32 partner vertex index, -1 empty
    normalT: jnp.ndarray    # (3, TC) f32 row-signed normal
    area_row: jnp.ndarray   # (TC,) f32 lumped area of the row vertex
    area_part: jnp.ndarray  # (TC,) f32
    counts: jnp.ndarray     # (L,) f32 active slots per layer
    overflow: jnp.ndarray   # () bool — a layer exceeded its c_eff budget


def build_kernel_geom(tables, area: jnp.ndarray, n_particles: int,
                      budgets: tuple, x: jnp.ndarray | None = None
                      ) -> KernelGeom:
    """Partner tables -> kernel slot geometry (once per step).  Uses the
    SAME per-layer drop rule as selfcol.build_compact_layers: the FIRST
    budgets[l] active rows in index order are kept, the surplus dropped
    and flagged.

    SCATTER-FREE, SORT-FREE, GATHER-FREE: the r5 cost bisection measured
    the previous cumsum+scatter compaction at ~20 ms/step at B=64 (365k
    vmapped scatter updates lower to sequential per-index loops on TPU —
    the actual source of r4's 'implementation-independent' full-contact
    overhead), and a lax.top_k variant at the same cost (lowers to a full
    sort).  Compaction here is pure compare-and-reduce: slot s's row is
    the unique row with pos == s (pos = exclusive cumsum of the active
    mask), extracted by an (n, C) equality mask and single-nonzero sums —
    integer sums for indices (exact), f32 single-product sums for normals
    and areas (exact, order-free).  Everything fuses on the VPU; nothing
    sequentializes."""
    n = n_particles
    specs, TC = layer_specs(budgets)
    iota = jnp.arange(n, dtype=jnp.int32)
    a32 = area.astype(jnp.float32)
    ir_l, ip_l, nrm_l, ar_l, ap_l, counts = [], [], [], [], [], []
    overflow = jnp.asarray(False)
    for l, (start, c_pad, c_eff) in enumerate(specs):
        p = tables.partner[l]
        has = p >= 0
        pos = jnp.cumsum(has.astype(jnp.int32)) - 1
        n_act = jnp.sum(has)
        slot = jnp.arange(c_pad, dtype=jnp.int32)
        eq = (has[:, None] & (pos[:, None] == slot[None, :])
              & (slot[None, :] < c_eff))              # (n, c_pad)
        eqi = eq.astype(jnp.int32)
        valid = jnp.any(eq, axis=0)                   # (c_pad,)
        pc = jnp.maximum(p, 0)
        ir = jnp.sum(eqi * iota[:, None], axis=0)
        ip = jnp.sum(eqi * pc[:, None], axis=0)
        ar = jnp.sum(eq.astype(jnp.float32) * a32[:, None], axis=0)
        # partner-side quantities via a second (c_pad, n) equality reduce
        # (a direct a[p] lookup would be an (n,)-batched row gather — the
        # slowest primitive on v5e)
        eq2 = (ip[:, None] == iota[None, :]) & valid[:, None]
        ap = jnp.sum(eq2.astype(jnp.float32) * a32[None, :], axis=1)
        if x is not None:
            # row-signed normal from positions, per SLOT: building the
            # full (L, n, 3) normal table upstream costs an (L*n)-row
            # batched x-gather (8.3 ms/step at B=64, the r5 trace's top
            # op) for <= C actual contacts
            x32 = x.astype(jnp.float32)
            xr = jnp.sum(jnp.where(eq[:, :, None], x32[:, None, :], 0.0),
                         axis=0)                          # (c_pad, 3)
            xp = jnp.sum(jnp.where(eq2[:, :, None], x32[None, :, :], 0.0),
                         axis=1)
            dd = xr - xp
            nrm = dd / jnp.maximum(
                jnp.linalg.norm(dd, axis=-1, keepdims=True), 1e-12)
        else:
            nrm = jnp.sum(jnp.where(eq[:, :, None],
                                    tables.normal[l].astype(jnp.float32)
                                    [:, None, :], 0.0), axis=0)
        ir_l.append(jnp.where(valid, ir, -1))
        ip_l.append(jnp.where(valid, ip, -1))
        nrm_l.append(jnp.where(valid[None, :], nrm.T, 0.0))
        ar_l.append(jnp.where(valid, ar, 0.0))
        ap_l.append(jnp.where(valid, ap, 0.0))
        counts.append(jnp.minimum(n_act, c_eff))
        overflow = overflow | (n_act > c_eff)
    ir = jnp.concatenate(ir_l)
    ip = jnp.concatenate(ip_l)
    return KernelGeom(
        idx_row=ir.astype(jnp.float32),
        idx_part=ip.astype(jnp.float32),
        normalT=jnp.concatenate(nrm_l, axis=1),
        area_row=jnp.concatenate(ar_l),
        area_part=jnp.concatenate(ap_l),
        counts=jnp.stack(counts).astype(jnp.float32),
        overflow=overflow)


def slot_masses(geom: KernelGeom, density):
    """(k_red, inv_m_row, inv_m_part) from density — plain XLA math so
    dL/d(density) chains through the kernel's slot-space cotangents.
    Same double-where masked-reciprocal guards as the compact path (the
    r4 dress 0/0-NaN fix, selfcol.self_friction_compact)."""
    rho = jnp.asarray(density, jnp.float32)
    m_row = rho * geom.area_row
    m_part = rho * geom.area_part
    m_row_safe = jnp.where(geom.area_row > 0, m_row, 1.0)
    m_part_safe = jnp.where(geom.area_part > 0, m_part, 1.0)
    imr = jnp.where(geom.area_row > 0, 1.0 / m_row_safe, 0.0)
    imp = jnp.where(geom.area_part > 0, 1.0 / m_part_safe, 0.0)
    msum = m_row + m_part
    msum_safe = jnp.where(msum > 0, msum, 1.0)
    k_red = jnp.where(msum > 0, m_row * m_part / msum_safe, 0.0)
    return k_red, imr, imp


# ---------------------------------------------------------------------------
# slot-space friction math (3, C) layout, shared by both kernels

def _fric_cases(nrmT, d):
    """Common case data of the Signorini-Coulomb projection at d."""
    sd = jnp.sum(d * nrmT, axis=0, keepdims=True)          # (1, C)
    fN = nrmT * sd
    fT = d - fN
    n2 = jnp.sum(fT * fT, axis=0, keepdims=True)
    safe = n2 > EPS * EPS
    tnorm = jnp.where(safe, jnp.sqrt(jnp.where(safe, n2, 1.0)), EPS)
    t_hat = fT / tnorm
    in_contact = sd < 0.0
    stick = tnorm <= MU_CLOTH * jnp.abs(sd)
    return sd, fN, fT, tnorm, t_hat, in_contact, stick


def _dff_T(nrmT, d):
    """dry_friction_force in (3, C) layout — op-for-op contact.py:223-239."""
    sd, fN, fT, tnorm, t_hat, in_contact, stick = _fric_cases(nrmT, d)
    r_stick = -fN - fT
    r_slide = -fN - MU_CLOTH * jnp.abs(sd) * t_hat
    r = jnp.where(stick, r_stick, r_slide)
    return jnp.where(in_contact, r, 0.0)


def _dff_JT(nrmT, d, w3):
    """(d dff/dd)^T w — the transposed per-slot friction Jacobian at d.

    stick: r = -d               -> J^T w = -w
    slide: r = -(d.n)n - mu|sd| t_hat ->
      J^T w = -((n.w) + mu sign(sd)(t_hat.w)) n
              - (mu|sd|/tn)(w - (n.w)n - (t_hat.w)t_hat)
    (uses t_hat . n = 0 exactly; fT is the projection off n).
    takeoff: 0.  Matches XLA reverse-mode through dry_friction_force's
    double-where construction (oracle-tested)."""
    sd, fN, fT, tnorm, t_hat, in_contact, stick = _fric_cases(nrmT, d)
    nw = jnp.sum(nrmT * w3, axis=0, keepdims=True)
    tw = jnp.sum(t_hat * w3, axis=0, keepdims=True)
    jt_stick = -w3
    jt_slide = (-(nw + MU_CLOTH * jnp.sign(sd) * tw) * nrmT
                - (MU_CLOTH * jnp.abs(sd) / tnorm)
                * (w3 - nw * nrmT - tw * t_hat))
    jt = jnp.where(stick, jt_stick, jt_slide)
    return jnp.where(in_contact, jt, 0.0)


# ---------------------------------------------------------------------------
# kernels

def _fwd_kernel(counts_ref, frT_ref, idxr_ref, idxp_ref, nrmT_ref,
                kred_ref, imr_ref, imp_ref, out_ref, vals_ref, *,
                specs, block_b: int):
    n_pad = frT_ref.shape[-1]
    f32 = jnp.float32
    for b in range(block_b):
        fr = frT_ref[b]                                  # (8, n_pad)
        for l, (start, c_pad, c_eff) in enumerate(specs):
            cnt = counts_ref[b, l]
            fr_l = fr          # pre-layer state: all chunks select from it
            for c in range(c_pad // CHUNK):
                s0 = start + c * CHUNK
                ir = idxr_ref[b, s0:s0 + CHUNK]          # (128,) f32
                ip = idxp_ref[b, s0:s0 + CHUNK]
                nrm = nrmT_ref[b, :, s0:s0 + CHUNK]      # (3, 128)
                kred = kred_ref[b, s0:s0 + CHUNK]
                imr = imr_ref[b, s0:s0 + CHUNK]
                imp = imp_ref[b, s0:s0 + CHUNK]

                def do(fr_acc, fr_l=fr_l, ir=ir, ip=ip, nrm=nrm,
                       kred=kred, imr=imr, imp=imp):
                    col = jax.lax.broadcasted_iota(
                        jnp.int32, (n_pad, CHUNK), 0).astype(f32)
                    oh_r = (col == ir[None, :]).astype(f32)
                    oh_p = (col == ip[None, :]).astype(f32)
                    vq = jnp.dot(fr_l, oh_r,
                                 preferred_element_type=f32,
                                 precision=_DOT_PREC)    # (8, 128)
                    vp = jnp.dot(fr_l, oh_p,
                                 preferred_element_type=f32,
                                 precision=_DOT_PREC)
                    q = vq[0:3]
                    p = vp[0:3]
                    d = q * imr[None, :] - p * imp[None, :]
                    rs = kred[None, :] * _dff_T(nrm, d)  # (3, 128)
                    r8 = jnp.concatenate(
                        [rs, jnp.zeros((5, CHUNK), f32)], axis=0)
                    fr_new = fr_acc + jnp.dot(r8, oh_r.T,
                                              preferred_element_type=f32,
                                 precision=_DOT_PREC)
                    return fr_new, vq, vp

                def skip(fr_acc):
                    z = jnp.zeros((8, CHUNK), f32)
                    return fr_acc, z, z

                fr, vq, vp = jax.lax.cond(cnt > c * CHUNK, do, skip, fr)
                vals_ref[b, 0:3, s0:s0 + CHUNK] = vq[0:3]
                vals_ref[b, 3:6, s0:s0 + CHUNK] = vp[0:3]
                vals_ref[b, 6:8, s0:s0 + CHUNK] = jnp.zeros(
                    (2, CHUNK), f32)
        out_ref[b] = fr


def _bwd_kernel(counts_ref, g_ref, idxr_ref, idxp_ref, nrmT_ref,
                kred_ref, imr_ref, imp_ref, vals_ref,
                gout_ref, ckred_ref, cimr_ref, cimp_ref, *,
                specs, block_b: int):
    """Transpose of _fwd_kernel's linearization at the saved select values
    (reverse layer order; within a layer all chunks select from the
    post-later-layers cotangent, mirroring the forward's pre-layer
    selects)."""
    n_pad = g_ref.shape[-1]
    f32 = jnp.float32
    for b in range(block_b):
        g = g_ref[b]                                     # (8, n_pad)
        for l, (start, c_pad, c_eff) in reversed(list(enumerate(specs))):
            cnt = counts_ref[b, l]
            g_l = g
            for c in range(c_pad // CHUNK):
                s0 = start + c * CHUNK
                ir = idxr_ref[b, s0:s0 + CHUNK]
                ip = idxp_ref[b, s0:s0 + CHUNK]
                nrm = nrmT_ref[b, :, s0:s0 + CHUNK]
                kred = kred_ref[b, s0:s0 + CHUNK]
                imr = imr_ref[b, s0:s0 + CHUNK]
                imp = imp_ref[b, s0:s0 + CHUNK]
                q = vals_ref[b, 0:3, s0:s0 + CHUNK]
                p = vals_ref[b, 3:6, s0:s0 + CHUNK]

                def do(g_acc, g_l=g_l, ir=ir, ip=ip, nrm=nrm, kred=kred,
                       imr=imr, imp=imp, q=q, p=p):
                    # w = E^T g: select cot rows at the slot row indices
                    col = jax.lax.broadcasted_iota(
                        jnp.int32, (n_pad, CHUNK), 0).astype(f32)
                    oh_r = (col == ir[None, :]).astype(f32)
                    oh_p = (col == ip[None, :]).astype(f32)
                    w = jnp.dot(g_l, oh_r,
                                preferred_element_type=f32,
                                 precision=_DOT_PREC)     # (8, 128)
                    w3 = w[0:3]
                    d = q * imr[None, :] - p * imp[None, :]
                    u = kred[None, :] * _dff_JT(nrm, d, w3)     # (3, 128)
                    # d = imr*q - imp*p with q = E^T fr, p = S^T fr:
                    cq8 = jnp.concatenate(
                        [u * imr[None, :], jnp.zeros((5, CHUNK), f32)],
                        axis=0)
                    cp8 = jnp.concatenate(
                        [-u * imp[None, :], jnp.zeros((5, CHUNK), f32)],
                        axis=0)
                    g_new = (g_acc
                             + jnp.dot(cq8, oh_r.T,
                                       preferred_element_type=f32,
                                 precision=_DOT_PREC)
                             + jnp.dot(cp8, oh_p.T,
                                       preferred_element_type=f32,
                                 precision=_DOT_PREC))
                    ck = jnp.sum(_dff_T(nrm, d) * w3, axis=0)   # (128,)
                    ci = jnp.sum(u * q, axis=0)
                    cp_out = -jnp.sum(u * p, axis=0)
                    return g_new, ck, ci, cp_out

                def skip(g_acc):
                    z = jnp.zeros((CHUNK,), f32)
                    return g_acc, z, z, z

                g, ck, ci, cp_out = jax.lax.cond(cnt > c * CHUNK, do,
                                                 skip, g)
                ckred_ref[b, s0:s0 + CHUNK] = ck
                cimr_ref[b, s0:s0 + CHUNK] = ci
                cimp_ref[b, s0:s0 + CHUNK] = cp_out
        gout_ref[b] = g


def _grid_call(kernel_body, n_outs_extra, counts, frT, *slot_args,
               specs, interpret: bool):
    """Shared pallas_call launcher: batched (B, ...) operands, grid over
    sample blocks, counts in SMEM.  Batches are zero-padded to a multiple
    of 8 samples (Mosaic block-divisibility; padded rows carry zero
    counts and cost only their VMEM copies)."""
    B = frT.shape[0]
    if B % 8 == 0 or B <= 8:
        # divisible blocks, or a single full-array block (both satisfy
        # Mosaic's divisible-by-8-or-full-axis rule)
        B8 = B
        Bb = 8 if B % 8 == 0 else B
    else:
        B8 = _round_up(B, 8)
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((B8 - B,) + a.shape[1:], a.dtype)], axis=0)
        counts = pad(counts)
        frT = pad(frT)
        slot_args = tuple(pad(a) for a in slot_args)
        Bb = 8
    n_pad = frT.shape[-1]
    L = len(specs)
    grid = (B8 // Bb,)
    kernel = functools.partial(kernel_body, specs=specs, block_b=Bb)
    vblk = lambda *s: pl.BlockSpec(
        (Bb,) + s, lambda g: (g,) + (0,) * len(s),
        memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((Bb, L), lambda g: (g, 0),
                        memory_space=pltpu.SMEM)
    in_specs = [sblk, vblk(8, n_pad)]
    shapes = [a.shape[1:] for a in slot_args]
    for s in shapes:
        in_specs.append(vblk(*s))
    out_specs = [vblk(8, n_pad)]
    out_shape = [jax.ShapeDtypeStruct((B8, 8, n_pad), jnp.float32)]
    for s in n_outs_extra:
        out_specs.append(vblk(*s))
        out_shape.append(jax.ShapeDtypeStruct((B8,) + s, jnp.float32))
    out = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(counts, frT, *slot_args)
    if B8 != B:
        out = [o[:B] for o in out]
    return out


_CACHE: dict = {}


def _fric_fns(budgets: tuple, interpret: bool):
    """Build (and cache) the custom-VJP friction function for a static
    budget tuple."""
    key = (budgets, interpret)
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    specs, TC = layer_specs(budgets)

    @jax.custom_batching.custom_vmap
    def fwd_grid(counts, frT, idxr, idxp, nrmT, kred, imr, imp):
        out = _grid_call(_fwd_kernel, [(8, TC)], counts[None], frT[None],
                         idxr[None], idxp[None], nrmT[None], kred[None],
                         imr[None], imp[None], specs=specs,
                         interpret=interpret)
        return out[0][0], out[1][0]

    @fwd_grid.def_vmap
    def _fwd_rule(axis_size, in_batched, *ops):
        ops = tuple(o if b else jnp.broadcast_to(o[None],
                                                 (axis_size,) + o.shape)
                    for o, b in zip(ops, in_batched))
        out = _grid_call(_fwd_kernel, [(8, TC)], *ops, specs=specs,
                         interpret=interpret)
        return (out[0], out[1]), (True, True)

    @jax.custom_batching.custom_vmap
    def bwd_grid(counts, g, idxr, idxp, nrmT, kred, imr, imp, vals):
        out = _grid_call(_bwd_kernel, [(TC,), (TC,), (TC,)], counts[None],
                         g[None], idxr[None], idxp[None], nrmT[None],
                         kred[None], imr[None], imp[None], vals[None],
                         specs=specs, interpret=interpret)
        return tuple(o[0] for o in out)

    @bwd_grid.def_vmap
    def _bwd_rule(axis_size, in_batched, *ops):
        ops = tuple(o if b else jnp.broadcast_to(o[None],
                                                 (axis_size,) + o.shape)
                    for o, b in zip(ops, in_batched))
        out = _grid_call(_bwd_kernel, [(TC,), (TC,), (TC,)], *ops,
                         specs=specs, interpret=interpret)
        return tuple(out), (True,) * 4

    @jax.custom_vjp
    def fric(frT, idxr, idxp, nrmT, kred, imr, imp, counts):
        out, _ = fwd_grid(counts, frT, idxr, idxp, nrmT, kred, imr, imp)
        return out

    def fric_fwd(frT, idxr, idxp, nrmT, kred, imr, imp, counts):
        out, vals = fwd_grid(counts, frT, idxr, idxp, nrmT, kred, imr,
                             imp)
        return out, (vals, idxr, idxp, nrmT, kred, imr, imp, counts)

    def fric_bwd(res, g):
        vals, idxr, idxp, nrmT, kred, imr, imp, counts = res
        gfr, ckred, cimr, cimp = bwd_grid(counts, g, idxr, idxp, nrmT,
                                          kred, imr, imp, vals)
        return (gfr, jnp.zeros_like(idxr), jnp.zeros_like(idxp),
                jnp.zeros_like(nrmT), ckred, cimr, cimp,
                jnp.zeros_like(counts))

    fric.defvjp(fric_fwd, fric_bwd)
    _CACHE[key] = fric
    return fric


def self_friction_kernel(f: jnp.ndarray, geom: KernelGeom, density,
                         r_init: jnp.ndarray, budgets: tuple,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Differentiable drop-in for selfcol.self_friction_compact on the
    kernel slot geometry: returns r_init + per-layer friction
    contributions.  f, r_init: (n, 3); density a scalar (gradient flows
    through the slot-mass chain)."""
    import os
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = f.shape[0]
    n_pad = _round_up(n, 128)
    k_red, imr, imp = slot_masses(geom, density)
    fr = (f + r_init).astype(jnp.float32)
    frT = jnp.zeros((8, n_pad), jnp.float32).at[0:3, 0:n].set(fr.T)
    if os.environ.get("DIFFCLOTH_FRIC_KERNEL_BYPASS", "") == "1":
        out = frT   # profiling ablation: transposes + pad only, no kernel
    else:
        out = _fric_fns(budgets, interpret)(
            frT, geom.idx_row, geom.idx_part, geom.normalT, k_red, imr,
            imp, geom.counts)
    return r_init + (out[0:3, 0:n].T - fr).astype(f.dtype)
