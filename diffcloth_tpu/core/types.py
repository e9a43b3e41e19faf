"""Device-side pytrees: static scene tensors, differentiable parameters,
per-step records.

TPU-native replacements for the reference's state structs
(`ForwardInformation` Simulation.h:68-100, `ParamInfo` :120-133,
`BackwardTaskInformation` :188-209).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class StageDev(NamedTuple):
    """One attachment stage's device tensors (one reference `sysMat`)."""
    attach_idx: jnp.ndarray     # (F,1) int32 row indices (cloth vertex)
    attach_w: jnp.ndarray       # (F,1)
    fixed_pos_rest: jnp.ndarray  # (F,3)
    spline_p0: jnp.ndarray      # (F,3)
    spline_yup: jnp.ndarray     # (F,)


class SceneDev(NamedTuple):
    """Static (non-differentiated) scene tensors, baked at trace time."""
    # stretch (triangle co-rotational) constraints
    tri_idx: jnp.ndarray        # (T,3) int32
    tri_inv_duv: jnp.ndarray    # (T,2,2)
    tri_area: jnp.ndarray       # (T,)
    s_rows_idx: jnp.ndarray     # (2T,3) int32
    s_rows_w: jnp.ndarray       # (2T,3) weightless
    # spring (per-edge length) constraints — empty unless
    # FabricConfig.use_spring_constraints
    sp_rows_idx: jnp.ndarray    # (S,2) int32
    sp_rows_w: jnp.ndarray      # (S,2) weightless (+1,-1)
    sp_l0: jnp.ndarray          # (S,) rest lengths
    # bending constraints
    b_rows_idx: jnp.ndarray     # (B,4) int32
    b_rows_w: jnp.ndarray       # (B,4) weightless (sqrt(3/(A0+A1)) * w_vert)
    b_w_vert: jnp.ndarray       # (B,4) raw cotan weights
    b_n_rest: jnp.ndarray       # (B,)
    b_sw: jnp.ndarray           # (B,) sqrt(3/(A0+A1))
    # lumped areas & misc
    area: jnp.ndarray           # (n,)
    radii: jnp.ndarray          # (n,)
    x_rest: jnp.ndarray         # (n,3)
    wind_falloff: jnp.ndarray   # (n,3), ones unless WIND_SIN_AND_FALLOFF


class SimParams(NamedTuple):
    """All differentiable simulation parameters (reference `ParamInfo`,
    Simulation.h:120-133).  Unused entries are zeros; the optimizer masks
    which ones to update."""
    k_pertype: jnp.ndarray       # (4,) [spring, attach, stretch, bend]
    density: jnp.ndarray         # ()
    wind: jnp.ndarray            # (3,) full wind vector (dir * norm)
    wind_freq: jnp.ndarray       # ()
    wind_phase: jnp.ndarray      # ()
    x0: jnp.ndarray              # (n,3) initial positions
    v0: jnp.ndarray              # (n,3) initial velocities
    spline: jnp.ndarray          # (F,9) per-fixed-point [p1, m0, m1]
    mu: jnp.ndarray              # (n_prims,) friction coefficients
    force_field: jnp.ndarray     # (n,3) constant per-particle force
    wind_perstep: jnp.ndarray    # (N+1,) per-step wind factor


class StepRecord(NamedTuple):
    """Per-step outputs stacked by the episode scan (reference
    `ForwardInformation`)."""
    x: jnp.ndarray               # (n,3)
    v: jnp.ndarray               # (n,3)
    f: jnp.ndarray               # (n,3) contact-solve force term
    r: jnp.ndarray               # (n,3) friction force
    x_fixed: jnp.ndarray         # (F,3)
    converged: jnp.ndarray       # () bool
    iters: jnp.ndarray           # () int32
    avg_deformation: jnp.ndarray  # ()
    max_deformation: jnp.ndarray  # () max per-triangle area ratio
    selfcol_overflow: jnp.ndarray  # () bool — self-contact capacity/window
    #                                exceeded this step (bump + recompile)


class EpisodeRecords(NamedTuple):
    """Full-episode output: the initial frame travels separately from the
    scan-stacked steps.  (Concatenating the initial frame onto the scan
    output inside jit hangs the TPU compiler under vmap, and keeping them
    apart is free: frame i of the reference's forwardRecords is x0 for i=0
    and steps.x[i-1] otherwise.)"""
    x0: jnp.ndarray              # (n,3)
    v0: jnp.ndarray              # (n,3)
    steps: StepRecord            # stacked over steps 1..N

    def frame_x(self, i: int):
        return self.x0 if i == 0 else self.steps.x[i - 1]

    @property
    def n_frames(self):
        return self.steps.x.shape[0] + 1

    def full_x(self):
        """(N+1, n, 3) stacked trajectory (host-side convenience; avoid
        inside vmapped jit — see class docstring)."""
        return jnp.concatenate([self.x0[None], self.steps.x], axis=0)

    def full_v(self):
        return jnp.concatenate([self.v0[None], self.steps.v], axis=0)


def make_sim_params(n: int, n_fixed: int, n_prims: int, n_steps: int,
                    dtype=jnp.float32,
                    k_stretch: float = 100.0, k_bend: float = 0.0,
                    k_attach: float = 10000.0, k_spring: float = 0.0,
                    density: float = 0.054) -> SimParams:
    """Defaults: attachment stiffness is the reference AttachmentSpring::k_stiff
    default (grep: AttachmentSpring.cpp)."""
    z3 = jnp.zeros((n, 3), dtype)
    return SimParams(
        k_pertype=jnp.array([k_spring, k_attach, k_stretch, k_bend], dtype),
        density=jnp.asarray(density, dtype),
        wind=jnp.zeros((3,), dtype),
        wind_freq=jnp.asarray(14.0, dtype),
        wind_phase=jnp.asarray(0.0, dtype),
        x0=z3, v0=z3,
        spline=jnp.zeros((n_fixed, 9), dtype),
        mu=jnp.zeros((max(n_prims, 1),), dtype),
        force_field=z3,
        wind_perstep=jnp.ones((n_steps + 1,), dtype),
    )
