"""The differentiable PD step: forward local–global loop + implicit adjoint.

Forward: velocity-based projective dynamics with dry frictional contact
(Ly et al. 2020 formulation), mirroring `Simulation::step`
(Simulation.cpp:1043-1428):

    s_n      = x_n + h v_n + h^2 M^{-1} f_ext                     (:1098)
    loop:    p = project(x_now)                                   (:1198)
             b = h^2 A^T p + M s_n                                (:1222)
             b~ = (b - P x_n)/h ;  f = b~ - C v_now               (:1248-1249)
             r = dry_friction(f)  [contact set frozen at iter 0]  (:1254-1258)
             v_new = P^{-1}(b~ + r);  x_new = x_n + h v_new       (:1267-1268)
    converged when |x_new - x_now|/n < eps, best-iterate revert at the
    iteration cap (:1323-1374).

Backward: `jax.custom_vjp` implementing the Du et al. adjoint
(`Simulation::stepBackward`, Simulation.cpp:1455-1780) by implicit
differentiation of the residual

    R(v_new; x_n, v_n, theta, x_fixed) = P v_new - b~(x_new) - r(f) = 0.

The adjoint lambda solves (dR/dv_new)^T lambda = w with w = v_bar + h x_bar
(this *is* the reference scheme: their per-step fold `dL_dx += dL_dv/h`
[:1615] makes their solve rhs equal w/h, with u* = lambda/h).  The fixed-point
iteration lambda <- P^{-1}(w + (P - dR/dv)^T lambda) reuses the constant
prefactorization exactly as the reference reuses its forward LLT factor
(:1569-1599).  All Jacobian-transpose products — projection Jacobians
(Triangle.cpp:354-451, TriangleBending.cpp:154-172), contact Jacobians
(Simulation.cpp:686-919), and every parameter chain rule (:1622-1764) — are
replaced by a single `jax.vjp` of the residual.

The system matrix lives on the vertex graph: P is (n,n), states are (n,3),
so the global solve is a P^{-1} @ (n,3) matmul that maps straight onto the
MXU and batches over vmapped rollouts.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffcloth_tpu.config import GRAVITY, SimFlags, WindConfig, pd_total_iters
from diffcloth_tpu.core import constraints as cons
from diffcloth_tpu.core import contact as ct
from diffcloth_tpu.core import dense_ops as dn
from diffcloth_tpu.core import selfcol as sc
from diffcloth_tpu.core import sparse_ops as spo
from diffcloth_tpu.core.types import SceneDev, SimParams, StageDev


class SelfColConfig(NamedTuple):
    """Static self-collision configuration for make_step.

    method 'matrix' (default, MXU pairwise-distance detection — see
    selfcol.detect_self_collisions_matrix): `allowed` is the
    upper-triangular non-adjacency table and `k_partners` bounds per-row
    extraction.  method 'sweep' (sort-based, O(n*window) memory for very
    large meshes): `allowed` is the symmetric table and `window` the
    sorted-order window."""
    allowed: jnp.ndarray   # (n,n) bool — candidate pair admissibility
    method: str
    window: int
    k_partners: int
    cap_pairs: int
    max_layers: int
    # build-time profiling knob (tools/step_profile.py):
    #   ''            — full pipeline (production)
    #   'nofric'      — detection + layering + tables built every step but
    #                   self-friction never applied (isolates the
    #                   per-PD-iteration friction cost)
    #   'detect_only' — detection runs every step (kept live through the
    #                   overflow flag); layering/tables/friction skipped
    # Ablated steps are NOT physical — profiling only.
    ablate: str = ""
    # friction_unroll > 0: apply self-friction as straight-line code over
    # that many layers instead of a dynamic while_loop (see
    # selfcol.self_friction_tables).  Layers beyond the bound are dropped.
    friction_unroll: int = 0
    # friction implementation: 'compact' (default — per-layer one-hot slot
    # matrices applied as thin MXU matmuls, selfcol.self_friction_compact;
    # zero gathers in the PD loop) or 'tables' (per-layer (n,) partner
    # gathers — the r4 bisection measured those batched row gathers at
    # ~3 ms/layer/iteration at tshirt B=64, 13x the rest of the step).
    friction_impl: str = "compact"
    # number of contact layers the compact path applies (layers beyond it
    # are dropped and FLAGGED via selfcol_overflow; real cloth rollouts
    # measured 0-3 populated layers, tools/friction_profile.py)
    compact_layers: int = 4
    # per-layer slot budgets override (None = compact_slot_budgets default);
    # bump when selfcol_overflow reports slot exhaustion on contact-rich
    # scenes (budget C costs one (n,C) one-hot pair per layer in HBM)
    compact_budgets: object = None


def _gmres_cycle(op, b, x0, m: int, with_residual: bool = False):
    """One GMRES(m) cycle on op(u) = b from x0 — plain lax ops only.

    `jax.scipy.sparse.linalg.gmres` builds a `custom_linear_solve`, which
    requires a *transposable* matvec; the scatter-free sparse operators
    (core/sparse_ops.py) are `custom_vjp` functions with no transpose rule.
    This runs inside the step's backward pass (never differentiated), so a
    hand-rolled Arnoldi cycle with static shapes is both sufficient and
    simpler.  Operands are flattened to vectors; H is the (m+1, m)
    Hessenberg least-squares system solved densely at the end.

    with_residual=True additionally returns the FREE residual-norm
    estimate ||beta e1 - H y|| == ||b - op(x)|| (exact in exact
    arithmetic) — the early-exit signal for restarted cycles."""
    shape = x0.shape
    flat = lambda a: a.reshape(-1)
    r0 = flat(b - op(x0))
    beta = jnp.linalg.norm(r0)
    N = r0.shape[0]
    V = jnp.zeros((m + 1, N), r0.dtype).at[0].set(
        r0 / jnp.maximum(beta, 1e-30))
    H = jnp.zeros((m + 1, m), r0.dtype)

    def arnoldi(j, carry):
        V, H = carry
        w = flat(op(V[j].reshape(shape)))
        # modified Gram-Schmidt against all m+1 slots (rows > j are zero)
        def mgs(i, c):
            w, H = c
            hij = jnp.where(i <= j, jnp.dot(V[i], w), 0.0)
            return w - hij * V[i], H.at[i, j].set(hij)
        w, H = jax.lax.fori_loop(0, m + 1, mgs, (w, H))
        hnext = jnp.linalg.norm(w)
        H = H.at[j + 1, j].set(hnext)
        V = V.at[j + 1].set(w / jnp.maximum(hnext, 1e-30))
        return V, H

    V, H = jax.lax.fori_loop(0, m, arnoldi, (V, H))
    e1 = jnp.zeros((m + 1,), r0.dtype).at[0].set(beta)
    y, *_ = jnp.linalg.lstsq(H, e1)
    x = x0 + (y @ V[:m]).reshape(shape)
    if with_residual:
        return x, jnp.linalg.norm(e1 - H @ y)
    return x


def _solve(p_inv, rhs):
    """P^{-1} @ rhs at full f32 precision.  On TPU, XLA lowers f32 matmuls to
    bf16 MXU passes by default; the PD solve is the accuracy-critical op (its
    noise floor sets the reachable convergence threshold), so force
    HIGHEST (3-pass f32) here and keep the default for everything else."""
    return jnp.matmul(p_inv, rhs, precision=jax.lax.Precision.HIGHEST)


def _pcg(op, b, diag_inv, max_iters: int, rtol: float):
    """Jacobi-preconditioned conjugate gradients on the SPD operator `op`,
    three right-hand sides jointly (b is (n,3); P x I_3 is SPD on the
    product space, so inner products run over all entries).

    The matrix-free global solve for meshes beyond the explicit dense
    P^{-1} (O(n^2) operator data stops paying for itself past dress scale,
    SURVEY section 7.4-5).  PD tolerates inexact global solves — the local
    projections re-correct each sweep — so a modest iteration cap is
    enough; the solve noise floor is governed by rtol like the dense
    path's is by the bf16/f32 matmul precision."""
    x = diag_inv[:, None] * b           # Jacobi initial guess
    r = b - op(x)
    z = diag_inv[:, None] * r
    p = z
    rz = jnp.sum(r * z)
    stop2 = (rtol * jnp.linalg.norm(b)) ** 2

    def cond(c):
        _, r, _, _, it = c
        return jnp.logical_and(it < max_iters,
                               jnp.sum(r * r) > stop2)

    def body(c):
        x, r, p, rz, it = c
        Ap = op(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = diag_inv[:, None] * r
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        return x, r, z + beta * p, rz_new, it + 1

    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x, r, p, rz, jnp.asarray(0, jnp.int32)))
    return x


class StepAux(NamedTuple):
    f: jnp.ndarray
    r: jnp.ndarray
    converged: jnp.ndarray
    iters: jnp.ndarray
    avg_deformation: jnp.ndarray
    max_deformation: jnp.ndarray
    selfcol_overflow: jnp.ndarray   # () bool — capacity/window exceeded


def _deformation(scene: SceneDev, x):
    """(total current area / total rest area, max per-triangle area ratio)
    (calculateTriangleDeformation / calculateMaxTriangleDeformation,
    Simulation.cpp:34-53)."""
    if scene.tri_idx.shape[0] == 0:
        one = jnp.asarray(1.0, x.dtype)
        return one, one
    p0 = x[scene.tri_idx[:, 0]]
    p1 = x[scene.tri_idx[:, 1]]
    p2 = x[scene.tri_idx[:, 2]]
    area = 0.5 * jnp.linalg.norm(jnp.cross(p1 - p0, p2 - p0), axis=-1)
    rest = scene.tri_area.astype(x.dtype)
    return (jnp.sum(area) / jnp.sum(rest),
            jnp.max(area / jnp.maximum(rest, 1e-30)))


def make_step(scene: SceneDev, stage: StageDev, prims: ct.PrimitiveSet,
              *, h: float, wind_config: WindConfig, flags: SimFlags,
              eps_forward: float, eps_backward: float,
              max_forward_iters: Optional[int] = None,
              solve_fn=None, self_cfg: Optional[SelfColConfig] = None,
              dense: Optional[dn.DenseOps] = None, sparse=None,
              solve_mode: str = "dense", cg_max_iters: int = 64,
              cg_rtol: float = 1e-6, plateau_window: int = 12):
    """Build the custom-VJP PD step for one attachment stage.

    Topology tensors (scene/stage/prims) are baked as trace-time constants;
    `p_inv` is a traced argument so parameter resets (which refactorize P,
    Simulation.cpp:3490-3584) do NOT trigger recompilation.

    `dense`: dense MXU constraint operators (core/dense_ops.py).  When given,
    every A / A^T / A^T A application is a dense matmul and projections are
    computed from y = A x with no vertex gathers — ~8x faster per PD
    iteration at tshirt scale and batch-scalable.

    `sparse`: scatter-free incidence operators (core/sparse_ops.py) for
    meshes too large for the dense path; falls back to the plain
    gather/scatter path when both are None.
    """
    n = int(scene.area.shape[0])
    # pluggable global solve: default is the local dense P^{-1} matmul; the
    # tensor-parallel path row-shards P^{-1} over a mesh axis and all-gathers
    # the solution (parallel/mesh.py); solve_mode='cg' uses matrix-free
    # Jacobi-PCG on P (p_inv data = 1/diag(P), see solver_for below)
    explicit_solve = solve_fn
    solve_fn = solve_fn or _solve
    max_iter = max_forward_iters or flags.max_forward_iters or \
        pd_total_iters(eps_forward)
    max_back = flags.max_backward_iters
    h2 = h * h
    gravity = jnp.asarray(GRAVITY)

    # -- shared pieces ------------------------------------------------------

    def wind_factor(params: SimParams, t, step_idx):
        """(sin(freq t + phase)+1)/2 and friends (fillForces,
        Simulation.cpp:62-85)."""
        if wind_config in (WindConfig.WIND_SIN, WindConfig.WIND_SIN_AND_FALLOFF):
            return (jnp.sin(params.wind_freq * t + params.wind_phase) + 1.0) / 2.0
        if wind_config == WindConfig.NO_WIND:
            return jnp.asarray(0.0, params.wind.dtype)
        if wind_config == WindConfig.WIND_FACTOR_PER_STEP:
            # step_idx travels as float so every custom-vjp input is
            # differentiable-typed; the gather itself carries the gradient
            # to wind_perstep.
            return params.wind_perstep[jnp.asarray(step_idx, jnp.int32)]
        return jnp.asarray(1.0, params.wind.dtype)  # WIND_CONSTANT

    def external_force(params: SimParams, mass, t, step_idx):
        """f_ext per particle (fillForces, Simulation.cpp:55-116)."""
        f = jnp.zeros((n, 3), mass.dtype)
        if flags.gravity_enabled:
            f = f + gravity.astype(mass.dtype) * mass[:, None]
        wf = wind_factor(params, t, step_idx)
        if flags.wind_enabled and wind_config != WindConfig.NO_WIND:
            wind_f = params.wind * wf
            if wind_config in (WindConfig.WIND_SIN_AND_FALLOFF,
                               WindConfig.WIND_FACTOR_PER_STEP):
                f = f + wind_f[None, :] * scene.wind_falloff
            else:
                f = f + wind_f[None, :]
        if flags.constant_forcefield_enabled:
            f = f + params.force_field
        return f, wf

    def masses(params: SimParams):
        return params.density * scene.area  # M = rho * Area (:2931-2937)

    def s_target(params, x_n, v_n, t, step_idx):
        m = masses(params)
        f_ext, wf = external_force(params, m, t, step_idx)
        s_n = x_n + h * v_n + h2 * f_ext / m[:, None]
        return s_n, m, wf

    use_self = (flags.contact_enabled and flags.self_collision_enabled
                and self_cfg is not None)
    has_contact = flags.contact_enabled and (prims.kind.shape[0] > 0
                                             or use_self)

    # -- constraint-operator applications (dense MXU path vs gather/scatter)

    def apply_A_all(x):
        """y_t = A0_t x for t in (stretch, bend, attach, spring)."""
        if dense is not None:
            y_s, y_b, y_a, y_sp = dn.apply_A(dense, x)
            return y_s, y_b, y_a, y_sp
        if sparse is not None:
            return spo.apply_A(sparse, x)
        return (cons.apply_rows(scene.s_rows_idx, scene.s_rows_w, x),
                cons.apply_rows(scene.b_rows_idx, scene.b_rows_w, x),
                cons.apply_rows(stage.attach_idx, stage.attach_w, x),
                cons.apply_rows(scene.sp_rows_idx, scene.sp_rows_w, x))

    def proj_all(x_eval, y_eval, x_fixed):
        """Weightless projections at x_eval (dense path reads them off
        y = A x_eval; gather path gathers vertices).  Returns
        (p_s, p_b, p_a, p_sp) aligned with apply_A_all's y order."""
        if dense is not None:
            p_s, p_b, p_a, p_sp = dn.projections_from_y(
                dense, y_eval[0], y_eval[1], x_fixed, y_sp=y_eval[3])
            return p_s, p_b, p_a, p_sp
        if sparse is not None:
            return spo.projections(sparse, scene, x_eval, x_fixed)
        p_s, p_b, p_a, p_sp = cons.all_projections(scene, stage, x_eval,
                                                   x_fixed)
        return p_s, p_b, p_a, p_sp

    def apply_At_all(k_pertype, d_s, d_b, d_a, d_sp):
        if dense is not None:
            return dn.apply_At(dense, k_pertype, d_s, d_b, d_a, d_sp)
        if sparse is not None:
            return spo.apply_At(sparse, k_pertype, d_s, d_b, d_a, d_sp)
        return cons.apply_At_p(scene, stage, k_pertype, d_s, d_b, d_a, n,
                               p_spring=d_sp)

    def apply_AtA_all(k_pertype, v, Sk=None):
        # per-type matvecs with SHARED (unbatched) S_t weights: a hoisted
        # Sk = sum k_t S_t materializes (B, n, n) under vmapped k_pertype
        # (520 MB/step at tshirt B=64, re-read every PD iteration — the
        # r5 trace's second-largest cost); Sk survives as an explicit
        # override for oracle paths only
        if dense is not None:
            if Sk is not None:
                return dn.apply_S(Sk, v)
            return dn.apply_S_pertype(dense.S, k_pertype, v)
        if sparse is not None:
            return spo.apply_AtA(sparse, k_pertype, v)
        return cons.apply_AtA(scene, stage, k_pertype, v)

    def friction(params, contact: ct.ContactSet, selfc, m, f,
                 differentiable=False):
        """Obstacle contacts first (layer 0), then layered self-contact
        Gauss-Seidel (calculateDryFrictionVector, Simulation.cpp:627-682).

        `selfc` is a (SelfContactTables, overflow) pair when self-collision
        is on; friction runs on the gather-only tables (built once per
        step) — the pair-list path's per-layer scatter-adds lower to
        sequential index loops on TPU and dominated the contact step (see
        selfcol.SelfContactTables)."""
        if not flags.contact_enabled:
            return jnp.zeros_like(f)
        if prims.kind.shape[0] > 0:
            r = ct.obstacle_friction(f, contact, m, params.mu)
        else:
            r = jnp.zeros_like(f)
        if use_self and self_cfg.ablate == "":
            fric_data, _ = selfc
            if self_cfg.friction_impl == "pallas":
                # the SAME custom-VJP kernel serves the forward PD loop
                # and the residual VJP (its backward is the transposed-
                # linearization kernel), so forward and backward friction
                # agree by construction — including the per-layer drop
                # budgets (ADVICE r4 medium)
                from diffcloth_tpu.core import friction_pallas as fp
                r = fp.self_friction_kernel(f, fric_data, params.density,
                                            r, _compact_budgets())
            elif self_cfg.friction_impl == "compact":
                r = sc.self_friction_compact(f, fric_data, params.density,
                                             m, r, ct.dry_friction_force)
            else:
                r = sc.self_friction_tables(f, fric_data, m, r,
                                            self_cfg.max_layers,
                                            ct.dry_friction_force,
                                            differentiable=differentiable,
                                            unroll=self_cfg.friction_unroll)
        return r

    def btilde_of(params, m, f_ext, x_n, v_n, x_eval, x_fixed, y_n=None):
        """b~ = (h^2 A^T p + M s_n - P x_n)/h computed in residual form

            b~ = h * sum_t k_t A0_t^T (p0_t - A0_t x_n) + m v_n + h f_ext

        — algebraically identical (s_n - x_n = h v_n + h^2 f_ext/m and
        P = M + h^2 A^T A) but free of the large-term cancellation that
        floors f32 convergence for energetic states, and cheaper (no
        separate P x_n / M s_n products).  y_n = A x_n is constant across
        PD iterations; callers in the loop hoist it."""
        y_eval = apply_A_all(x_eval)
        p_s, p_b, p_a, p_sp = proj_all(x_eval, y_eval, x_fixed)
        if y_n is None:
            y_n = apply_A_all(x_n)
        At_d = apply_At_all(params.k_pertype,
                            p_s - y_n[0], p_b - y_n[1], p_a - y_n[2],
                            p_sp - y_n[3])
        return h * At_d + m[:, None] * v_n + h * f_ext

    def residual(v_new, x_n, v_n, params, x_fixed, contact, selfc, t,
                 step_idx):
        """R(v_new) = P v_new - b~ - r, all parameter dependence explicit
        (operator form) so one jax.vjp yields every gradient the reference
        hand-derives in stepBackward (:1622-1764)."""
        m = masses(params)
        f_ext, _ = external_force(params, m, t, step_idx)
        x_new = x_n + h * v_new
        btilde = btilde_of(params, m, f_ext, x_n, v_n, x_new, x_fixed)
        Cv = h2 * apply_AtA_all(params.k_pertype, v_new)
        f = btilde - Cv
        r = friction(params, contact, selfc, m, f, differentiable=True)
        Pv = m[:, None] * v_new + Cv
        return Pv - btilde - r

    def apply_P(params, u, Sk=None):
        m = masses(params)
        return m[:, None] * u + h2 * apply_AtA_all(params.k_pertype, u, Sk)

    def solver_for(params, Sk=None):
        """The global solve for this step, closed over the parameter guess.
        'dense': p_inv is the explicit (n,n) inverse, one MXU matmul.
        'cg':    p_inv is 1/diag(P) (solver.make_host_p_diag_inv_fn) and
                 the solve is matrix-free Jacobi-PCG on apply_P — the
                 beyond-dress-scale path (SURVEY section 7.4-5)."""
        if explicit_solve is None and solve_mode == "cg":
            def sv(p_diag_inv, rhs):
                return _pcg(lambda u: apply_P(params, u, Sk), rhs,
                            p_diag_inv, cg_max_iters, cg_rtol)
            return sv
        return solve_fn

    # -- compact friction slot builders (shared by forward and step_bwd) --

    def _compact_budgets():
        n_lay = min(self_cfg.compact_layers, self_cfg.max_layers)
        budgets = self_cfg.compact_budgets or sc.compact_slot_budgets(n_lay)
        return tuple(min(c, n) for c in budgets)

    def build_compact_for(tables, overflow, dtype):
        budgets = _compact_budgets()
        compact = sc.build_compact_layers(
            tables, scene.area.astype(dtype), n, budgets)
        overflow = (overflow | compact.overflow |
                    (tables.n_layers > len(budgets)))
        return compact, overflow

    def rebuild_fric(selfc_save, dtype):
        """Saved (tables, overflow) -> the selfc form `residual` expects.
        Rebuilding the (n, C) one-hots here keeps them OUT of the stored
        VJP residuals (HBM: they dwarf everything else at batch).  The
        'pallas' impl needs no rebuild: its KernelGeom slot data is ~15 KB
        per step and is saved directly."""
        if not use_self or self_cfg.friction_impl != "compact" or \
                self_cfg.ablate == "detect_only":
            return selfc_save
        tables, overflow = selfc_save
        compact, overflow = build_compact_for(tables, overflow, dtype)
        return (compact, overflow)

    # -- forward PD loop ----------------------------------------------------

    def pd_forward(x_n, v_n, params, x_fixed, p_inv, t, step_idx):
        s_n, m, wf = s_target(params, x_n, v_n, t, step_idx)
        f_ext, _ = external_force(params, m, t, step_idx)

        v_iter0 = (s_n - x_n) / h
        if flags.contact_enabled and prims.kind.shape[0] > 0:
            contact = ct.detect_obstacle_contacts(prims, x_n, v_iter0, h,
                                                  t=t)
        else:
            contact = ct.ContactSet(
                mask=jnp.zeros((n,), bool), normal=jnp.zeros_like(x_n),
                v_out=jnp.zeros_like(x_n), prim_id=jnp.zeros((n,), jnp.int32))
        def compactify(tables, overflow):
            """tables -> per-layer compact slots (once per step); layers
            beyond the compact budget are dropped AND flagged.  The
            'pallas' impl builds KernelGeom (index-only slot data; the
            custom-VJP kernel serves forward AND residual).

            Returns (fric_data-selfc, save-selfc): the 'compact' save
            form carries only the SMALL partner tables — the (n, C)
            one-hot matrices must NOT enter the custom-VJP residuals (at
            B=64 x 25-step chunks they alone exhaust HBM); step_bwd
            rebuilds them.  KernelGeom is small enough to save as-is."""
            if self_cfg.friction_impl not in ("compact", "pallas") or \
                    self_cfg.ablate == "detect_only":
                return (tables, overflow), (tables, overflow)
            budgets = _compact_budgets()
            if self_cfg.friction_impl == "pallas":
                from diffcloth_tpu.core import friction_pallas as fp
                geom = fp.build_kernel_geom(
                    tables, scene.area.astype(x_n.dtype), n, budgets,
                    x=x_n)
                overflow = (overflow | geom.overflow |
                            (tables.n_layers > len(budgets)))
                pair = (geom, overflow)
                return pair, pair
            compact, overflow = build_compact_for(tables, overflow,
                                                  x_n.dtype)
            return (compact, overflow), (tables, overflow)

        if use_self:
            if self_cfg.method == "pallas":
                # scatter-free end to end: symmetric kernel partner table
                # -> dense layering -> friction tables (selfcol_pallas.
                # detect_tables_pallas); the pair-list detectors below
                # need the scatter-based compaction + layering
                from diffcloth_tpu.core import selfcol_pallas as scp
                if self_cfg.ablate == "detect_only":
                    geom = scp.build_geom(x_n, v_iter0, scene.radii, h,
                                          self_cfg.allowed.shape[0])
                    tbl = scp.detect_partners(geom, self_cfg.allowed,
                                              self_cfg.k_partners)
                    overflow = jnp.any(
                        tbl[:n, self_cfg.k_partners] > self_cfg.k_partners)
                    selfc = (sc.empty_layer_tables(
                        n, self_cfg.max_layers, x_n.dtype), overflow)
                    selfc_save = selfc
                else:
                    tables, overflow = scp.detect_tables_pallas(
                        self_cfg.allowed, scene.radii, x_n, v_iter0, h,
                        self_cfg.k_partners, self_cfg.max_layers,
                        with_normals=self_cfg.friction_impl != "pallas")
                    selfc, selfc_save = compactify(tables, overflow)
            else:
                if self_cfg.method == "matrix":
                    cs = sc.detect_self_collisions_matrix(
                        self_cfg.allowed, scene.radii, x_n, v_iter0, h,
                        self_cfg.k_partners, self_cfg.cap_pairs)
                else:
                    cs = sc.detect_self_collisions_sweep(
                        self_cfg.allowed, scene.radii, x_n, v_iter0, h,
                        self_cfg.window, self_cfg.cap_pairs)
                if self_cfg.ablate == "detect_only":
                    selfc = (sc.empty_layer_tables(
                        n, self_cfg.max_layers, x_n.dtype), cs.overflow)
                    selfc_save = selfc
                else:
                    cs = sc.assign_layers(cs, n, self_cfg.max_layers)
                    selfc, selfc_save = compactify(
                        sc.build_layer_tables(cs, n, self_cfg.max_layers),
                        cs.overflow)
        else:
            selfc = (sc.empty_layer_tables(n, 1, x_n.dtype),
                     jnp.asarray(False))
            selfc_save = selfc

        # constants across PD iterations, hoisted out of the loop body
        y_n = apply_A_all(x_n)
        Sk = None
        solve = solver_for(params, Sk)

        def one_iter(x_now, v_now):
            btilde = btilde_of(params, m, f_ext, x_n, v_n, x_now, x_fixed,
                               y_n=y_n)
            if has_contact:
                f = btilde - h2 * apply_AtA_all(params.k_pertype, v_now, Sk)
                r = friction(params, contact, selfc, m, f)
            else:
                # f (the pre-friction force, reference :1249) is only
                # consumed by the friction solve; skip it in contact-free
                # scenes and reconstruct it once post-loop for the record
                f = jnp.zeros_like(x_n)
                r = jnp.zeros_like(x_n)
            v_new = solve(p_inv, btilde + r)
            x_new = x_n + h * v_new
            return x_new, v_new, f, r

        class Carry(NamedTuple):
            x_now: jnp.ndarray
            v_now: jnp.ndarray
            it: jnp.ndarray
            min_xd: jnp.ndarray
            best_x: jnp.ndarray
            best_v: jnp.ndarray
            done: jnp.ndarray
            strict: jnp.ndarray
            since_best: jnp.ndarray
            f: jnp.ndarray
            r: jnp.ndarray

        x_start = s_n                      # loop starts from the inertia
        v_start = v_iter0                  # target (Simulation.cpp:1154-1160)
        init = Carry(
            x_now=x_start, v_now=v_start,
            it=jnp.asarray(0, jnp.int32),
            min_xd=jnp.linalg.norm(s_n - x_n) / n,   # :1173
            best_x=x_n, best_v=v_n, done=jnp.asarray(False),
            strict=jnp.asarray(False),
            since_best=jnp.asarray(0, jnp.int32),
            f=jnp.zeros_like(x_n), r=jnp.zeros_like(x_n))

        def cond(c: Carry):
            return jnp.logical_and(~c.done, c.it < max_iter)

        # In f32 the iteration settles into a rounding-scale limit cycle
        # whose amplitude tracks the state energy; once the best iterate has
        # not improved for PLATEAU_WINDOW sweeps there is no more progress
        # available at this precision, so stopping at the best iterate is
        # lossless.  (f64 runs hit eps first; the reference never needs this
        # because it is all-f64.)  The window is the confirm cost paid per
        # step at plateau exit; see ClothSim(plateau_window=...) for the
        # RMSE-validated default.
        PLATEAU_WINDOW = plateau_window

        def body(c: Carry):
            x_new, v_new, f, r = one_iter(c.x_now, c.v_now)
            xd = jnp.linalg.norm(x_new - c.x_now) / n
            better = xd < c.min_xd
            since = jnp.where(better, 0, c.since_best + 1)
            strict = xd < eps_forward
            return Carry(
                x_now=x_new, v_now=v_new, it=c.it + 1,
                min_xd=jnp.minimum(xd, c.min_xd),
                best_x=jnp.where(better, x_new, c.best_x),
                best_v=jnp.where(better, v_new, c.best_v),
                done=jnp.logical_or(strict, since >= PLATEAU_WINDOW),
                strict=strict, since_best=since, f=f, r=r)

        out = jax.lax.while_loop(cond, body, init)
        converged = out.done
        # strict convergence keeps the last iterate; plateau/cap exit reverts
        # to the best converging iterate (Simulation.cpp:1357-1367)
        x_new = jnp.where(out.strict, out.x_now, out.best_x)
        v_new = jnp.where(out.strict, out.v_now, out.best_v)
        f_rec = out.f
        if not has_contact:
            # reconstruct the pre-friction force record once, post-loop
            btilde_fin = btilde_of(params, m, f_ext, x_n, v_n, x_new,
                                   x_fixed, y_n=y_n)
            f_rec = btilde_fin - h2 * apply_AtA_all(params.k_pertype, v_new)
        avg_def, max_def = _deformation(scene, x_new)
        aux = StepAux(f=f_rec, r=out.r, converged=converged, iters=out.it,
                      avg_deformation=avg_def, max_deformation=max_def,
                      selfcol_overflow=selfc[1])
        return x_new, v_new, aux, contact, selfc_save

    # -- custom VJP ---------------------------------------------------------

    @jax.custom_vjp
    def step(x, v, params, x_fixed, p_inv, t, step_idx):
        x_new, v_new, aux, _, _ = pd_forward(x, v, params, x_fixed, p_inv,
                                             t, step_idx)
        return x_new, v_new, aux

    def step_fwd(x, v, params, x_fixed, p_inv, t, step_idx):
        x_new, v_new, aux, contact, selfc_save = pd_forward(
            x, v, params, x_fixed, p_inv, t, step_idx)
        res = (x, v, v_new, params, x_fixed, contact, selfc_save, p_inv, t,
               step_idx)
        return (x_new, v_new, aux), res

    def step_bwd(res, cots):
        (x_n, v_n, v_new, params, x_fixed, contact, selfc_save, p_inv, t,
         step_idx) = res
        # the saved self-contact form carries only the small partner
        # tables; rebuild the compact slot matrices the residual needs
        selfc = rebuild_fric(selfc_save, x_n.dtype)
        x_bar, v_bar, _aux_bar = cots

        # total cotangent on v_new: x_new = x_n + h v_new
        w = v_bar + h * x_bar
        if flags.gradient_clipping:
            # reference clips the folded gradient dL_dx = w/h at
            # threshold * n_particles (Simulation.cpp:1460-1466)
            norm = jnp.linalg.norm(w) / h
            cap = flags.gradient_clipping_threshold * n
            scale = jnp.where(norm > cap, cap / jnp.maximum(norm, 1e-30), 1.0)
            w = w * scale

        w_norm_in = jnp.linalg.norm(w)

        # One VJP of K(v) = b~(x_n + h v) + r(f(v)) instead of the full
        # residual R = P v - K: since P lam - (dR/dv)^T lam = (dK/dv)^T lam
        # exactly (P is constant in v), the fixed-point rhs needs ONLY
        # vjp_k — saving one apply_P (4 per-type AtA matmuls) per trip.
        def k_fn(vn):
            m_k = masses(params)
            f_ext_k, _ = external_force(params, m_k, t, step_idx)
            x_new_k = x_n + h * vn
            btilde_k = btilde_of(params, m_k, f_ext_k, x_n, v_n, x_new_k,
                                 x_fixed)
            f_k = btilde_k - h2 * apply_AtA_all(params.k_pertype, vn)
            r_k = friction(params, contact, selfc, m_k, f_k,
                           differentiable=True)
            return btilde_k + r_k

        _, vjp_k = jax.vjp(k_fn, v_new)

        def vjp_v(u):
            # (dR/dv)^T u for the GMRES fallback only
            return (apply_P(params, u) - vjp_k(u)[0],)

        solve = solver_for(params)
        op_pre = lambda u: solve(p_inv, vjp_v(u)[0])
        b_pre = solve(p_inv, w)

        if flags.adjoint_mode == "gmres":
            # ---- primary adjoint solver: restarted preconditioned GMRES.
            # The reference's Richardson fixed point lam <- P^{-1}(w +
            # dK^T lam) (:1569-1599) needs rho(P^{-1} dK^T) < 1; our f32
            # plateau-exit forward states sit at rho ~ 1 (the forward PD
            # loop masks this with best-iterate tracking), and the on-chip
            # curves show the fp stalling at 1e-1..1e-2 then DIVERGING
            # (output/adjoint_parity_r5.json) — every step fell through to
            # the old GMRES fallback anyway, after wasting up to `cap`
            # matvecs.  Left-preconditioned GMRES minimizes the residual
            # regardless of rho; each restarted cycle exits early on the
            # FREE Hessenberg residual estimate, on the same
            # |P^{-1}(w - dR^T lam)|/(n h) < eps_b scale as the reference
            # criterion.  Stagnation (a cycle improving the best residual
            # by <5%) also stops — returning the best iterate, mirroring
            # the forward's best-iterate revert.
            M = flags.adjoint_gmres_m
            max_cycles = max(1, max_back // (M + 2))
            scale_nh = n * h

            def true_res(u):
                # TRUE preconditioned residual (one matvec).  The free
                # Hessenberg estimate is a LIE at f32: modified
                # Gram-Schmidt loses orthogonality over the cycle (the
                # operator itself carries the friction kernel's rounding),
                # after which both the estimate and the lstsq step can be
                # garbage — measured on chip as 100x-off gradients when
                # cycles were accepted on the estimate alone.
                return jnp.linalg.norm(solve(p_inv, w - vjp_v(u)[0]))

            def gm_cond(c):
                _, _, best_res, cyc, stop = c
                return ~stop & (cyc < max_cycles)

            def gm_body(c):
                cur, best, best_res, cyc, _ = c
                sol = _gmres_cycle(op_pre, b_pre, cur, m=M)
                res = true_res(sol)
                ok = jnp.isfinite(res) & jnp.all(jnp.isfinite(sol))
                better = ok & (res < best_res)
                best2 = jnp.where(better, sol, best)
                best_res2 = jnp.where(better, res, best_res)
                stop = ((best_res2 / scale_nh < eps_backward)
                        | ~better | (res > 0.9 * best_res))
                # restart from the best iterate so a garbage cycle can
                # never poison the Krylov start
                return (best2, best2, best_res2, cyc + 1, stop)

            r0 = true_res(b_pre)
            r0 = jnp.where(jnp.isfinite(r0), r0, jnp.inf)
            _, lam, _, back_cycles, _ = jax.lax.while_loop(
                gm_cond, gm_body,
                (b_pre, b_pre, r0, jnp.asarray(0, jnp.int32),
                 (r0 / scale_nh < eps_backward)))
        else:
            # ---- legacy 'fp' mode: the reference's fixed point with a
            # while_loop GMRES fallback (kept as a cross-check oracle)
            def fp_cond(c):
                lam, lam_prev, it, done, bad = c
                return ~(done | bad) & (it < max_back)

            def fp_body(c):
                lam, _, it, _, _ = c
                rhs = w + vjp_k(lam)[0]
                lam_next = solve(p_inv, rhs)
                delta = jnp.linalg.norm(lam_next - lam) / (n * h)
                bad = ~jnp.isfinite(delta) | (
                    jnp.linalg.norm(lam_next) > 1e8 * (w_norm_in + 1e-30))
                return (lam_next, lam, it + 1, delta < eps_backward, bad)

            lam, _, back_iters, back_ok, back_bad = jax.lax.while_loop(
                fp_cond, fp_body, (b_pre, jnp.zeros_like(b_pre),
                                   jnp.asarray(1, jnp.int32),
                                   jnp.asarray(False), jnp.asarray(False)))

            # while_loop (NOT lax.cond) fallback: a cond with a batched
            # predicate lowers to select — both branches execute for every
            # sample; the while runs zero trips when no sample needs it
            def fb_cond(c):
                _, need, cyc = c
                return need & (cyc < 3)

            def fb_body(c):
                lam_c, _, cyc = c
                x0g = jnp.where(jnp.isfinite(lam_c), lam_c, 0.0)
                sol = _gmres_cycle(op_pre, b_pre, x0g, m=16)
                sol = jnp.where(jnp.isfinite(sol), sol, 0.0)
                res = jnp.linalg.norm(
                    solve(p_inv, w - vjp_v(sol)[0])) / (n * h)
                return sol, (res >= eps_backward) | ~jnp.isfinite(res), \
                    cyc + 1

            need0 = ~(back_ok & ~back_bad) & (w_norm_in > 0)
            lam, _, _ = jax.lax.while_loop(
                fb_cond, fb_body, (lam, need0, jnp.asarray(0, jnp.int32)))
        # zero-cotangent short-circuit: a frozen (exploded) step receives
        # zero cotangents through the scan's freeze select; the lam=0
        # solution is exact there, but evaluating the residual VJP at the
        # exploded state would turn 0 * NaN into NaN.  The reference
        # likewise never runs stepBackward past an explosion (the rollout
        # is frozen, Simulation.cpp:1415-1424).
        lam = jnp.where(w_norm_in > 0, lam, 0.0)

        def rest_vjp(lam):
            _, vjp_rest = jax.vjp(
                lambda xn, vn, pr, xf: residual(v_new, xn, vn, pr, xf,
                                                contact, selfc, t, step_idx),
                x_n, v_n, params, x_fixed)
            return vjp_rest(lam)

        def rest_zero(lam):
            return (jnp.zeros_like(x_n), jnp.zeros_like(v_n),
                    jax.tree.map(jnp.zeros_like, params),
                    jnp.zeros_like(x_fixed))

        gx, gv, gp, gxf = jax.lax.cond(w_norm_in > 0, rest_vjp, rest_zero,
                                       lam)

        x_bar_out = x_bar - gx
        v_bar_out = -gv
        params_bar = jax.tree.map(lambda g: -g, gp)
        xf_bar = -gxf
        p_inv_bar = jnp.zeros_like(p_inv)
        t_bar = jnp.zeros_like(t)
        idx_bar = jnp.zeros_like(step_idx)
        return (x_bar_out, v_bar_out, params_bar, xf_bar, p_inv_bar,
                t_bar, idx_bar)

    step.defvjp(step_fwd, step_bwd)
    return step, residual
