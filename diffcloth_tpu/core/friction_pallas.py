"""Pallas TPU kernel for the layered self-friction application.

The r4 on-chip bisection isolated the ENTIRE full-contact slowdown (B=64
tshirt: 380 vs 5190 steps/s) in the per-PD-iteration self-friction.  The
XLA compact-matmul path (selfcol.self_friction_compact) removed the
pathological batched row gathers but still streams its per-layer one-hot
matrices and the (B, n, 3) force state through HBM on every PD iteration
(~5 ms/iter at B=64).

This kernel runs the WHOLE layered Gauss-Seidel sweep in VMEM:

  per sample: load frT = (f + r)^T once (8, n_pad)
    for each contact layer l (static unroll):
      one-hot_cat (n_pad, 2C) built in VMEM from the slot indices (VPU
        iota-compare — never touches HBM)
      vals (8, 2C) = frT @ one-hot_cat          (MXU, contraction n_pad)
      d (3, C)     = vals_row * inv_m_row - vals_part * inv_m_part
      r_slot (3,C) = k_red * dry_friction(normalT, d, mu)   (VPU)
      frT         += r_slot8 @ one-hot_row^T     (MXU scatter-back)
  store frT once

HBM traffic per call: the force state in + out and KB-scale slot data —
nothing else.  The transposed (8, n_pad) layout keeps every matmul's
padded dimension at 8 sublanes instead of 128 lanes (a 42x MAC saving
over the (n,3) orientation).

Math is op-for-op `selfcol.self_friction_compact` (same slot semantics,
same dry_friction_force case split, same safe_norm guard), so the forward
PD loop can use this kernel while the residual keeps the XLA path for its
VJP — both evaluate the same function.

reference: calculateDryFrictionVector (Simulation.cpp:627-682).
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


class KernelLayers(NamedTuple):
    """Per-step compact slot data for the friction kernel (indices + slot
    physics — NO materialized one-hots; the kernel builds those in VMEM).
    Shapes below are unbatched; the production call site vmaps them."""
    idxcat: jnp.ndarray     # (L, 2C) int32 [row_idx | part_idx], -1 empty
    row_idx: jnp.ndarray    # (L, C) int32
    normalT: jnp.ndarray    # (L, 3, C) row-signed normal, transposed
    k_red: jnp.ndarray      # (L, C) reduced mass (0 for empty slots)
    inv_m_row: jnp.ndarray  # (L, C)
    inv_m_part: jnp.ndarray # (L, C)
    overflow: jnp.ndarray   # () bool


def build_kernel_layers(tables, area: jnp.ndarray, density,
                        n_particles: int, budget: int,
                        n_layers: int) -> KernelLayers:
    """Partner tables -> kernel slot data (once per step).  A UNIFORM slot
    budget per layer keeps the kernel shapes static and simple."""
    n = n_particles
    C = _round_up(budget, 128)   # lane-aligned slot axis for the kernel
    iota = jnp.arange(n, dtype=jnp.int32)
    rows_l, cats_l, nrm_l, kr_l, imr_l, imp_l = [], [], [], [], [], []
    overflow = jnp.asarray(False)
    for l in range(n_layers):
        p = tables.partner[l]
        has = p >= 0
        pos = jnp.cumsum(has.astype(jnp.int32)) - 1
        tgt = jnp.where(has & (pos < C), pos, C)
        row_idx = jnp.full((C,), -1, jnp.int32).at[tgt].set(
            iota, mode="drop", unique_indices=True)
        part_idx = jnp.full((C,), -1, jnp.int32).at[tgt].set(
            p, mode="drop", unique_indices=True)
        overflow = overflow | (jnp.sum(has) > C)
        valid = row_idx >= 0
        rc = jnp.maximum(row_idx, 0)
        pc = jnp.maximum(part_idx, 0)
        m_row = density * jnp.where(valid, area[rc], 0.0)
        m_part = density * jnp.where(valid, area[pc], 0.0)
        rows_l.append(row_idx)
        cats_l.append(jnp.concatenate([row_idx, part_idx]))
        nrm_l.append(jnp.where(valid[None, :],
                               tables.normal[l][rc].T, 0.0))
        kr_l.append(m_row * m_part / jnp.maximum(m_row + m_part, 1e-30))
        imr_l.append(jnp.where(valid, 1.0 / jnp.maximum(m_row, 1e-30), 0.0))
        imp_l.append(jnp.where(valid, 1.0 / jnp.maximum(m_part, 1e-30),
                               0.0))
    f32 = lambda a: jnp.stack(a).astype(jnp.float32)
    return KernelLayers(
        idxcat=jnp.stack(cats_l), row_idx=jnp.stack(rows_l),
        normalT=f32(nrm_l), k_red=f32(kr_l),
        inv_m_row=f32(imr_l), inv_m_part=f32(imp_l), overflow=overflow)


def _dff_T(nrmT, d, mu_scalar: float, k_red):
    """dry_friction_force in (3, C) layout — op-for-op contact.py:223-239
    with the safe_norm double-where, times k_red, masked by in_contact."""
    sd = jnp.sum(d * nrmT, axis=0, keepdims=True)          # (1, C)
    fN = nrmT * sd
    fT = d - fN
    n2 = jnp.sum(fT * fT, axis=0, keepdims=True)
    safe = n2 > EPS * EPS
    tnorm = jnp.where(safe, jnp.sqrt(jnp.where(safe, n2, 1.0)), EPS)
    t_hat = fT / tnorm
    in_contact = sd < 0.0
    stick = tnorm <= mu_scalar * jnp.abs(sd)
    r_stick = -fN - fT
    r_slide = -fN - mu_scalar * jnp.abs(sd) * t_hat
    r = jnp.where(stick, r_stick, r_slide)
    r = jnp.where(in_contact, r, 0.0)
    return k_red[None, :] * r


def _kernel(frT_ref, idxcat_ref, row_ref, nrmT_ref, kred_ref, imr_ref,
            imp_ref, out_ref, *, n_layers: int, block_b: int):
    n_pad = frT_ref.shape[-1]
    C2 = idxcat_ref.shape[-1]
    C = C2 // 2
    for b in range(block_b):
        fr = frT_ref[b]                                  # (8, n_pad)
        for l in range(n_layers):
            idxcat = idxcat_ref[b, l]                    # (2C,)
            col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, C2), 0)
            onehot = (col == idxcat[None, :]).astype(jnp.float32)
            vals = jnp.dot(fr, onehot,
                           preferred_element_type=jnp.float32)  # (8, 2C)
            vrow = vals[0:3, 0:C]
            vpart = vals[0:3, C:]
            d = (vrow * imr_ref[b, l][None, :]
                 - vpart * imp_ref[b, l][None, :])        # (3, C)
            r_slot = _dff_T(nrmT_ref[b, l], d, MU_CLOTH, kred_ref[b, l])
            r8 = jnp.concatenate(
                [r_slot, jnp.zeros((5, C), jnp.float32)], axis=0)
            rowc = jax.lax.broadcasted_iota(jnp.int32, (C, n_pad), 1)
            oh_row = (rowc == row_ref[b, l][:, None]).astype(jnp.float32)
            fr = fr + jnp.dot(r8, oh_row,
                              preferred_element_type=jnp.float32)
        out_ref[b] = fr


def _friction_grid(frT_b, kl_idxcat, kl_row, kl_nrmT, kl_kred, kl_imr,
                   kl_imp, *, n_layers: int, interpret: bool,
                   block_b: int = None):
    """Natively batched launch: frT_b (B, 8, n_pad).  Batch blocks of
    `block_b` samples per grid step (one TensorCore — the block just
    amortizes grid-step overhead)."""
    import os
    if block_b is None:
        block_b = int(os.environ.get("DIFFCLOTH_FRIC_BLOCK_B", "8"))
    B = frT_b.shape[0]
    n_pad = frT_b.shape[-1]
    Bb = max(1, min(block_b, B))
    if B % Bb != 0:
        Bb = 1
    grid = (B // Bb,)
    L, C2 = kl_idxcat.shape[-2:]
    C = C2 // 2
    kernel = functools.partial(_kernel, n_layers=n_layers, block_b=Bb)
    blk = lambda *s: pl.BlockSpec((Bb,) + s, lambda g: (g,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            blk(8, n_pad),
            blk(L, C2), blk(L, C), blk(L, 3, C), blk(L, C), blk(L, C),
            blk(L, C),
        ],
        out_specs=blk(8, n_pad),
        out_shape=jax.ShapeDtypeStruct((B, 8, n_pad), jnp.float32),
        interpret=interpret,
    )(frT_b, kl_idxcat, kl_row, kl_nrmT, kl_kred, kl_imr, kl_imp)


_FRIC_CACHE: dict = {}


def _friction_fn(n_layers: int, interpret: bool):
    key = (n_layers, interpret)
    fn = _FRIC_CACHE.get(key)
    if fn is not None:
        return fn

    @jax.custom_batching.custom_vmap
    def fric(frT, idxcat, row, nrmT, kred, imr, imp):
        return _friction_grid(frT[None], idxcat[None], row[None],
                              nrmT[None], kred[None], imr[None], imp[None],
                              n_layers=n_layers, interpret=interpret)[0]

    @fric.def_vmap
    def _rule(axis_size, in_batched, *ops):
        # broadcast any unbatched operand (e.g. slot data shared across
        # the batch when the contact set is sample-independent)
        ops = tuple(o if b else jnp.broadcast_to(o[None],
                                                 (axis_size,) + o.shape)
                    for o, b in zip(ops, in_batched))
        out = _friction_grid(*ops, n_layers=n_layers, interpret=interpret)
        return out, True

    _FRIC_CACHE[key] = fric
    return fric


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def self_friction_kernel(f: jnp.ndarray, kl: KernelLayers,
                         r_init: jnp.ndarray, n_layers: int,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in for self_friction_compact on the forward PD path: returns
    r_init + per-layer friction contributions.  f, r_init: (n, 3)."""
    import os
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = f.shape[0]
    n_pad = _round_up(n, 128)
    fr = (f + r_init).astype(jnp.float32)
    frT = jnp.zeros((8, n_pad), jnp.float32).at[0:3, 0:n].set(fr.T)
    if os.environ.get("DIFFCLOTH_FRIC_KERNEL_BYPASS", "") == "1":
        out = frT   # profiling ablation: transposes + pad only, no kernel
    else:
        out = _friction_fn(n_layers, interpret)(
            frT, kl.idxcat, kl.row_idx, kl.normalT, kl.k_red,
            kl.inv_m_row, kl.inv_m_part)
    return r_init.astype(f.dtype) + (out[0:3, 0:n].T - fr).astype(f.dtype)
