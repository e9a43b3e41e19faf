"""Episode orchestration: device scene assembly, attachment trajectories,
and the `lax.scan` rollout with reverse-mode gradients.

TPU-native equivalent of `Simulation::runBackwardTask`
(Simulation.cpp:3853-3961): the forward N-step loop becomes one `lax.scan`
over the custom-VJP step, and the reverse sweep (N x `stepBackward`) is
produced by `jax.grad` through the scan — each step's backward is our
implicit-adjoint VJP, and parameter gradients accumulate across steps exactly
as the reference accumulates them in `BackwardInformation`.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffcloth_tpu.config import (SimFlags, SplineType,
                                  TrajectoryConfig, WindConfig)
from diffcloth_tpu.core import contact as ct
from diffcloth_tpu.core import selfcol as sc
from diffcloth_tpu.core import solver as slv
from diffcloth_tpu.core import spline as spl
from diffcloth_tpu.core import step as step_mod
from diffcloth_tpu.core.types import (EpisodeRecords, SceneDev, SimParams,
                                      StageDev, StepRecord, make_sim_params)
from diffcloth_tpu.geometry import builder as gb


def _wind_falloff(scene: gb.Scene) -> np.ndarray:
    """Per-particle wind attenuation min(1/|focus - x|, 1) (reference
    sim2real setup, Simulation.cpp:3125-3131 — the variable is named
    distSquared there but holds the norm; behavior mirrored)."""
    focus = getattr(scene.cfg, "wind_falloff_focus", None)
    if focus is None:
        return np.ones((scene.n, 3))
    dist = np.linalg.norm(np.asarray(focus)[None, :] - scene.x_rest, axis=-1)
    fall = np.minimum(1.0 / np.maximum(dist, 1e-12), 1.0)
    return np.repeat(fall[:, None], 3, axis=1)


def scene_to_device(scene: gb.Scene, dtype=jnp.float32) -> SceneDev:
    s_rows = gb.stretch_rows(scene.triangle)
    b_rows = gb.bend_rows(scene.bending)
    sp_rows = gb.spring_rows(scene.springs)
    f = lambda a: jnp.asarray(a, dtype)
    return SceneDev(
        tri_idx=jnp.asarray(scene.triangle.idx, jnp.int32),
        tri_inv_duv=f(scene.triangle.inv_duv),
        tri_area=f(scene.triangle.area),
        s_rows_idx=jnp.asarray(s_rows.idx, jnp.int32),
        s_rows_w=f(s_rows.w),
        sp_rows_idx=jnp.asarray(sp_rows.idx, jnp.int32),
        sp_rows_w=f(sp_rows.w),
        sp_l0=f(scene.springs.l0),
        b_rows_idx=jnp.asarray(b_rows.idx, jnp.int32),
        b_rows_w=f(b_rows.w),
        b_w_vert=f(scene.bending.w_vert),
        b_n_rest=f(scene.bending.n_rest),
        b_sw=f(np.sqrt(3.0 / np.maximum(scene.bending.area_sum, 1e-30))),
        area=f(scene.area),
        radii=f(scene.radii),
        x_rest=f(scene.x_rest),
        wind_falloff=f(_wind_falloff(scene)),
    )


def gb_selfcol_candidates(scene: gb.Scene):
    return sc.build_candidate_pairs(scene.conn_table)


def stage_to_device(stage: gb.AttachmentStage, dtype=jnp.float32) -> StageDev:
    a_rows = gb.attach_rows(stage)
    f = lambda a: jnp.asarray(a, dtype)
    return StageDev(
        attach_idx=jnp.asarray(a_rows.idx, jnp.int32),
        attach_w=f(a_rows.w),
        fixed_pos_rest=f(stage.fixed_pos_rest),
        spline_p0=f(stage.spline_p0),
        spline_yup=f(stage.spline_yup),
    )


class ClothSim:
    """Facade bundling a built scene with its jitted step / episode functions.

    One instance per (mesh topology, scene config, dtype) — analogous to the
    reference `Simulation` object but immutable and functional: all mutable
    quantities travel through `SimParams` / state arguments.
    """

    def __init__(self, scene: gb.Scene, *, flags: Optional[SimFlags] = None,
                 prims: Optional[ct.PrimitiveSet] = None,
                 dtype=jnp.float32,
                 spline_type: SplineType = SplineType.ENDPOINT,
                 eps_forward: Optional[float] = None,
                 eps_backward: Optional[float] = None,
                 max_forward_iters: Optional[int] = None,
                 solve_fn=None, self_cap_pairs: Optional[int] = None,
                 self_max_layers: int = 16, self_window: int = 48,
                 self_method: Optional[str] = None,
                 self_k_partners: Optional[int] = None,
                 self_ablate: str = "", self_friction_unroll: int = 0,
                 self_friction_impl: Optional[str] = None,
                 self_compact_layers: int = 4,
                 self_compact_budgets: Optional[tuple] = None,
                 dense_ops: Optional[bool] = None,
                 sparse_ops: Optional[bool] = None,
                 solve_mode: Optional[str] = None,
                 cg_max_iters: int = 64, cg_rtol: float = 1e-6,
                 plateau_window: int = 12):
        # persistent XLA compilation cache: contact programs cost minutes
        # of (remote) compile; cache hits make repeat processes start in
        # seconds.  Idempotent; opt out with DIFFCLOTH_NO_COMPILE_CACHE=1.
        import os
        if not os.environ.get("DIFFCLOTH_NO_COMPILE_CACHE"):
            try:
                # only when still unset: never override a host
                # application's own cache configuration (ADVICE r4)
                if jax.config.jax_compilation_cache_dir is None:
                    jax.config.update(
                        "jax_compilation_cache_dir",
                        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                       "/tmp/diffcloth_jax_cache"))
                    jax.config.update(
                        "jax_persistent_cache_min_compile_time_secs", 5)
            except Exception:
                pass
        cfg = scene.cfg
        self.scene_host = scene
        self.cfg = cfg
        self.dtype = dtype
        self.flags = flags or SimFlags(
            wind_enabled=cfg.wind_config != WindConfig.NO_WIND)
        self.spline_type = spline_type
        self.h = cfg.time_step
        self.n = scene.n
        self.n_steps = cfg.step_num
        # f32 cannot resolve displacement deltas below ~1e-7 of |x|; floor the
        # forward tolerance accordingly (x64 runs keep the reference value).
        eps_f = eps_forward if eps_forward is not None else \
            cfg.forward_convergence_thresh
        if dtype == jnp.float32:
            eps_f = max(eps_f, 1e-6)
        self.eps_forward = eps_f
        self.eps_backward = eps_backward if eps_backward is not None else \
            cfg.backward_convergence_thresh

        self.scene_dev = scene_to_device(scene, dtype)
        # Attachment stages: one reference `sysMat` per stage, switched by
        # frame number (Simulation.h:374, selection Simulation.cpp:1053-1068).
        # TPU-native: stage boundaries are trace-time constants, so the
        # episode is a *sequence of scans* — one per stage segment, each with
        # its own baked attachment operators and prefactorized P — instead of
        # a per-step dynamic select.  Single-stage scenes (all five headline
        # demos) keep the exact previous single-scan shape.
        self.stages_host = list(scene.stages)
        self.stage_devs = [stage_to_device(s, dtype) for s in scene.stages]
        self.stage_host = self.stages_host[0]
        self.stage_dev = self.stage_devs[0]
        self.n_stages = len(self.stages_host)
        self.max_fixed = max((len(s.particle_idx) for s in self.stages_host),
                             default=0)
        # frames k in 1..N run stage s on [seg_start, seg_end); reference:
        # stage i active iff forwardRecords.size() >= startFrameNum_i, last
        # wins (Simulation.cpp:1053-1056)
        starts = [s.start_frame for s in self.stages_host]
        if starts != sorted(starts):
            raise ValueError("attachment stages must be ordered by "
                             "start_frame")
        self._segments = []
        for s in range(self.n_stages):
            lo = max(starts[s], 1)
            hi = starts[s + 1] if s + 1 < self.n_stages else cfg.step_num + 1
            hi = max(min(hi, cfg.step_num + 1), lo)
            if hi > lo:
                self._segments.append((s, lo, hi))
        self.prims = prims if prims is not None else \
            ct.empty_primitive_set(dtype)

        # global solve: explicit dense P^{-1} up to ~dress scale; past that
        # the O(n^2) operator data stops paying for itself -> matrix-free
        # Jacobi-PCG whose per-evaluation data is 1/diag(P) (SURVEY 7.4-5)
        if solve_mode is None:
            solve_mode = "dense" if scene.n <= 8000 else "cg"
        self.solve_mode = solve_mode
        area64 = np.asarray(scene.area, np.float64)
        if solve_mode == "dense":
            self._p_inv_fns = [
                slv.make_host_p_inv_fn(g, area64, self.h, dtype)
                for g in slv.dense_gram_matrices(scene)]
        else:
            self._p_inv_fns = [
                slv.make_host_p_diag_inv_fn(None, area64, self.h, dtype,
                                            gram_diags=d)
                for d in slv.gram_diagonals(scene)]
        self._p_inv_fn = (self._p_inv_fns[0] if self.n_stages == 1 else
                          lambda k, rho: tuple(f(k, rho)
                                               for f in self._p_inv_fns))

        self_cfg = None
        if (self.flags.contact_enabled and self.flags.self_collision_enabled
                and scene.n > 1):
            # the reference enables self-collision for EVERY demo, incl.
            # obstacle-free ones (setWindAncCollision(_, _, true) in all
            # branches of OptimizationTaskSetup.cpp:154-224).  Default
            # detection on TPU is the Pallas streaming kernel: O(n*K)
            # outputs (vs the matrix method's (B, n, n) HBM transients,
            # which OOM-crash the chip under large vmap batches) and
            # measured 4.4x faster at B=32 on v5e with exact pair parity
            # (tools/detect_experiment.py).  CPU backends keep the XLA
            # matrix method (Pallas interpret mode is slow); the sort-based
            # sweep takes over past ~10k vertices where an n^2 admissibility
            # mask no longer pays for itself.
            if self_method is None:
                if scene.n > 10000:
                    self_method = "sweep"
                else:
                    self_method = ("pallas"
                                   if jax.default_backend() == "tpu"
                                   else "matrix")
            if self_method == "pallas" and scene.n > 46340:
                # int32 canonical pair ids (min*n + max) overflow past
                # n^2 >= 2^31 (selfcol.layer_tables_from_partners);
                # fall back to the sort-based sweep path (ADVICE r4)
                self_method = "sweep"
            allowed = ~scene.conn_table & ~np.eye(scene.n, dtype=bool)
            if self_method == "matrix":
                allowed &= np.triu(np.ones_like(allowed), 1)
            if self_method == "pallas":
                # SYMMETRIC table: the kernel discovers each pair from both
                # rows, making the partner table the complete per-particle
                # contact incidence (scatter-free layering + friction,
                # selfcol_pallas.detect_tables_pallas).  Rows now hold ALL
                # partners (not just the j>i half), so the per-row slot
                # budget defaults higher than the triu detectors'.
                from diffcloth_tpu.core import selfcol_pallas as scp
                allowed_dev = jnp.asarray(scp.pack_allowed(allowed))
                if self_k_partners is None:
                    self_k_partners = 8
            else:
                allowed_dev = jnp.asarray(allowed)
                if self_k_partners is None:
                    self_k_partners = 6
            if self_friction_impl is None:
                # in-VMEM Pallas kernel pair on TPU (custom-VJP: forward
                # PD loop AND adjoint residual share the same function;
                # chunk-skipped cost proportional to actual contacts —
                # the r5 rebuild, friction_pallas.py); XLA compact
                # matmuls elsewhere (exact, and the CPU test oracle)
                self_friction_impl = ("pallas"
                                      if jax.default_backend() == "tpu"
                                      else "compact")
            cap = self_cap_pairs or max(128, scene.n // 2)
            window = min(self_window, scene.n - 1)
            self_cfg = step_mod.SelfColConfig(
                allowed=allowed_dev, method=self_method,
                window=window, k_partners=self_k_partners,
                cap_pairs=cap, max_layers=self_max_layers,
                ablate=self_ablate,
                friction_unroll=self_friction_unroll,
                friction_impl=self_friction_impl,
                compact_layers=self_compact_layers,
                compact_budgets=self_compact_budgets)
        self.self_cfg = self_cfg

        # dense MXU constraint operators: default on up to a size where the
        # O(R*n) operator memory stays cheap; gather/scatter path above that
        # (profiling: dense is ~8x faster per PD iteration at tshirt scale,
        # see core/dense_ops.py).  The operators are closed over by the
        # jitted step and embed in the executable as constants, so the gate
        # is on total operator bytes (the axon remote-compile transport
        # rejects program uploads past a few hundred MB).
        if sparse_ops:
            dense_ops = False
        if dense_ops is None:
            T2 = 2 * len(scene.triangle.area)
            Bn = len(scene.bending.n_rest)
            op_bytes = 4 * (2 * T2 * scene.n + 2 * Bn * scene.n
                            + 3 * scene.n * scene.n) * self.n_stages
            dense_ops = op_bytes <= 300 * 1024 * 1024
        self.dense_list = [None] * self.n_stages
        if dense_ops:
            from diffcloth_tpu.core import dense_ops as dn
            self.dense_list = [dn.build_dense_ops(scene, sh, dtype)
                               for sh in self.stages_host]
        self.dense = self.dense_list[0]
        # large-mesh path: scatter-free incidence operators (sparse_ops.py)
        # whenever the dense gate fails — the plain gather/scatter path
        # (sparse_ops=False) survives only as a reference oracle for tests
        if sparse_ops is None:
            sparse_ops = not dense_ops
        self.sparse_list = [None] * self.n_stages
        if sparse_ops and not dense_ops:
            from diffcloth_tpu.core import sparse_ops as spo
            self.sparse_list = [spo.build_sparse_ops(scene, sh, dtype)
                                for sh in self.stages_host]
        self.sparse = self.sparse_list[0]

        self.steps = []
        self.residuals = []
        for sd, dnops, spops in zip(self.stage_devs, self.dense_list,
                                    self.sparse_list):
            st, rs = step_mod.make_step(
                self.scene_dev, sd, self.prims,
                h=self.h, wind_config=cfg.wind_config, flags=self.flags,
                eps_forward=self.eps_forward,
                eps_backward=self.eps_backward,
                max_forward_iters=max_forward_iters, solve_fn=solve_fn,
                self_cfg=self_cfg, dense=dnops, sparse=spops,
                solve_mode=solve_mode, cg_max_iters=cg_max_iters,
                cg_rtol=cg_rtol, plateau_window=plateau_window)
            self.steps.append(st)
            self.residuals.append(rs)
        self.step = self.steps[0]
        self.residual = self.residuals[0]

    # ------------------------------------------------------------------ params

    def _default_spline(self) -> jnp.ndarray:
        """(F,9) for single-stage scenes; (S, F_max, 9) zero-padded stack for
        multi-stage (one spline set per sysMat, Simulation.h:372)."""
        per_stage = []
        for sh, sd in zip(self.stages_host, self.stage_devs):
            sp = spl.default_params_from_endpoints(
                sd.spline_p0, jnp.asarray(sh.spline_p1, self.dtype),
                sd.spline_yup)
            if self.n_stages > 1:
                sp = jnp.pad(sp, ((0, self.max_fixed - sp.shape[0]), (0, 0)))
            per_stage.append(sp)
        if self.n_stages == 1:
            return per_stage[0]
        return jnp.stack(per_stage)

    def default_params(self) -> SimParams:
        fab = self.cfg.fabric
        p = make_sim_params(
            self.n, n_fixed=len(self.stage_host.particle_idx),
            n_prims=max(int(self.prims.kind.shape[0]), 1),
            n_steps=self.n_steps, dtype=self.dtype,
            k_stretch=fab.k_stiff_stretching, k_bend=fab.k_stiff_bending,
            density=fab.density)
        p = p._replace(
            x0=jnp.asarray(self.scene_host.x_rest, self.dtype),
            v0=jnp.asarray(self.scene_host.v_init, self.dtype),
            spline=self._default_spline(),
        )
        if self.prims.kind.shape[0] > 0:
            p = p._replace(mu=self.prims.mu.astype(self.dtype))
        return p

    def p_inv(self, params: SimParams):
        """Refactorize the PD system for a parameter guess (the TPU analogue
        of resetSystemWithParams -> initializePrefactoredMatrices).  Returns
        the (n,n) inverse for single-stage scenes, a tuple of per-stage
        inverses otherwise (one prefactorization per sysMat,
        Simulation.cpp:2969-3059)."""
        return self._p_inv_fn(params.k_pertype, params.density)

    # -------------------------------------------------------- fixed trajectory

    def _xf_for_stage(self, s: int, params: SimParams,
                      fracs: jnp.ndarray) -> jnp.ndarray:
        """(len(fracs), F_s, 3) clip positions for stage s at the given
        global simulation-time fractions (stepFixPoints evaluates splines at
        the whole-episode fraction regardless of stage,
        Simulation.cpp:1004-1011)."""
        sh, sd = self.stages_host[s], self.stage_devs[s]
        F = len(sh.particle_idx)
        traj = self.cfg.trajectory
        rest = sd.fixed_pos_rest.astype(self.dtype)
        L = fracs.shape[0]
        if F == 0 or traj == TrajectoryConfig.NO_TRAJECTORY:
            return jnp.broadcast_to(rest, (L, F, 3))
        if traj in (TrajectoryConfig.CORNERS_2_UP,
                    TrajectoryConfig.CORNERS_2_WEARHAT,
                    TrajectoryConfig.CORNERS_1_WEARHAT,
                    TrajectoryConfig.CORNERS_2_WEARSOCK):
            spline = params.spline if self.n_stages == 1 else \
                params.spline[s, :F]
            return spl.eval_splines(self.spline_type, spline,
                                    sd.spline_p0, sd.spline_yup, fracs)
        if traj == TrajectoryConfig.TRAJECTORY_DRESS_TWIRL:
            # per-step rotation of 0.02 rad about the vertical axis through
            # restShapeMidPoint (Simulation.cpp:980-994); closed form since
            # rotation about y preserves y
            mid = jnp.asarray(self.scene_host.rest_mid, self.dtype)
            ang = 0.02 * fracs * self.n_steps
            rel = rest - jnp.array([mid[0], 0.0, mid[2]], self.dtype)
            cx, sx = jnp.cos(ang)[:, None], jnp.sin(ang)[:, None]
            x_rot = cx * rel[None, :, 0] + sx * rel[None, :, 2]
            z_rot = -sx * rel[None, :, 0] + cx * rel[None, :, 2]
            out = jnp.stack(
                [x_rot + mid[0],
                 jnp.broadcast_to(rest[None, :, 1], x_rot.shape),
                 z_rot + mid[2]], axis=-1)
            return out
        raise NotImplementedError(f"trajectory {traj}")

    def x_fixed_seq(self, params: SimParams) -> jnp.ndarray:
        """(N, F, 3) clip positions for steps 1..N (stepFixPoints,
        Simulation.cpp:964-1018), differentiable w.r.t. spline params.
        Multi-stage scenes pad F to the max stage size; each segment's scan
        consumes only its stage's leading F_s rows."""
        N = self.n_steps
        fracs = (jnp.arange(1, N + 1, dtype=self.dtype)) / N
        if self.n_stages == 1:
            return self._xf_for_stage(0, params, fracs)
        parts = []
        for s, lo, hi in self._segments:
            xf = self._xf_for_stage(s, params, fracs[lo - 1:hi - 1])
            parts.append(jnp.pad(
                xf, ((0, 0), (0, self.max_fixed - xf.shape[1]), (0, 0))))
        return jnp.concatenate(parts, axis=0)

    # ---------------------------------------------------------------- episode

    def _p_inv_of(self, p_inv, s: int):
        return p_inv if self.n_stages == 1 else p_inv[s]

    @functools.partial(jax.jit, static_argnums=0)
    def simulate(self, params: SimParams, p_inv,
                 x_fixed_seq: jnp.ndarray) -> EpisodeRecords:
        """Full rollout: frame 0 (initial state, forwardRecords[0]) plus the
        scan-stacked records for steps 1..N.  One scan per attachment-stage
        segment (single-stage scenes: exactly one)."""
        h = self.h
        from diffcloth_tpu.core import diagnostics as diag

        def seg_recs(s, lo, hi, carry):
            step = self.steps[s]
            F_s = len(self.stages_host[s].particle_idx)
            p_inv_s = self._p_inv_of(p_inv, s)

            def body(carry, inp):
                x, v, frozen = carry
                x_fixed, idx_f = inp
                t = idx_f * h
                x2, v2, aux = step(x, v, params, x_fixed, p_inv_s, t, idx_f)
                # explosion freeze: once the state blows up, the remaining
                # rollout passes through unchanged (Simulation.cpp:1415-1424)
                frozen = jnp.logical_or(frozen, diag.is_exploded(x2, v2))
                x2 = jnp.where(frozen, x, x2)
                v2 = jnp.where(frozen, v, v2)
                xf_rec = jnp.pad(
                    x_fixed, ((0, self.max_fixed - F_s), (0, 0)))
                rec = StepRecord(x=x2, v=v2, f=aux.f, r=aux.r,
                                 x_fixed=xf_rec,
                                 converged=aux.converged, iters=aux.iters,
                                 avg_deformation=aux.avg_deformation,
                                 max_deformation=aux.max_deformation,
                                 selfcol_overflow=aux.selfcol_overflow)
                return (x2, v2, frozen), rec

            idx_f = jnp.arange(lo, hi, dtype=self.dtype)
            return jax.lax.scan(
                body, carry, (x_fixed_seq[lo - 1:hi - 1, :F_s], idx_f))

        carry = (params.x0, params.v0, jnp.asarray(False))
        rec_parts = []
        for s, lo, hi in self._segments:
            carry, recs = seg_recs(s, lo, hi, carry)
            rec_parts.append(recs)
        recs = rec_parts[0] if len(rec_parts) == 1 else jax.tree.map(
            lambda *a: jnp.concatenate(a, axis=0), *rec_parts)
        return EpisodeRecords(x0=params.x0, v0=params.v0, steps=recs)

    def rollout(self, params: SimParams) -> EpisodeRecords:
        """Convenience: refactorize + trajectory + simulate."""
        return self.simulate(params, self.p_inv(params),
                             self.x_fixed_seq(params))

    def _chunk_size(self, chunk: int) -> int:
        N = self.n_steps
        if N % chunk != 0:
            # keep one compiled shape per pass
            chunk = [c for c in range(chunk, 0, -1) if N % c == 0][0]
        return chunk

    def _chunk_execs(self, chunk: int, batched: bool):
        """Compiled per-chunk forward / VJP executables, cached on the sim.

        The forward threads the explosion-freeze flag through the scan AND
        between chunks (carried host-side), so chunked rollouts freeze
        blow-ups exactly like `simulate` (Simulation.cpp:1415-1424); frozen
        steps pass state (and, through the `where` select, cotangents)
        straight through.  Besides the stacked trajectory the forward also
        emits the per-step solver stats (converged/iters/overflow/
        deformation) so forward-only consumers (loss evaluation, record
        export) see the same diagnostics as `simulate`."""
        h = self.h
        cache = getattr(self, "_chunk_exec_cache", None)
        if cache is None:
            cache = self._chunk_exec_cache = {}
        key = (chunk, batched)
        if key in cache:
            return cache[key]

        from diffcloth_tpu.core import diagnostics as diag

        def chunk_roll(x, v, frozen, params, p_inv, xfs_c, idxs_c):
            def body(c, inp):
                x, v, frozen = c
                xf, i = inp
                x2, v2, aux = self.step(x, v, params, xf, p_inv,
                                        i * h, i)
                frozen = jnp.logical_or(frozen, diag.is_exploded(x2, v2))
                x2 = jnp.where(frozen, x, x2)
                v2 = jnp.where(frozen, v, v2)
                stats = (aux.converged, aux.iters, aux.selfcol_overflow,
                         aux.avg_deformation, aux.max_deformation)
                return (x2, v2, frozen), (x2, v2, stats)
            (xN, vN, frozenN), (Xc, Vc, stats) = jax.lax.scan(
                body, (x, v, frozen), (xfs_c, idxs_c))
            return xN, vN, frozenN, Xc, Vc, stats

        def vjp_chunk(x, v, frozen, params, p_inv, xfs_c, idxs_c, cot):
            def diff_roll(x_, v_, p_, xf_):
                xN, vN, _, Xc, Vc, _ = chunk_roll(x_, v_, frozen, p_,
                                                  p_inv, xf_, idxs_c)
                return xN, vN, Xc, Vc
            _, vjp = jax.vjp(diff_roll, x, v, params, xfs_c)
            return vjp(cot)

        if batched:
            fwd_jit = jax.jit(jax.vmap(
                chunk_roll, in_axes=(0, 0, 0, 0, None, 0, None)))
            bwd_jit = jax.jit(jax.vmap(
                vjp_chunk, in_axes=(0, 0, 0, 0, None, 0, None, 0)))
        else:
            fwd_jit = jax.jit(chunk_roll)
            bwd_jit = jax.jit(vjp_chunk)
        cache[key] = (fwd_jit, bwd_jit)
        return fwd_jit, bwd_jit

    def _chunk_forward(self, params, p_inv, xfs, chunk: int,
                       keep_inputs: bool = False):
        """Run the whole horizon through the cached chunked forward.
        Returns (X, V, stats, chunk_inputs) with stats a tuple of stacked
        per-step arrays; `chunk_inputs` (the (x, v, frozen) entering each
        chunk) only when keep_inputs (needed for the reverse sweep)."""
        chunk = self._chunk_size(chunk)
        fwd_jit, _ = self._chunk_execs(chunk, batched=False)
        N = self.n_steps
        idx_f = jnp.arange(1, N + 1, dtype=self.dtype)
        x, v = params.x0, params.v0
        frozen = jnp.asarray(False)
        ins, Xs, Vs, stats_parts = [], [], [], []
        for c in range(N // chunk):
            sl = slice(c * chunk, (c + 1) * chunk)
            if keep_inputs:
                ins.append((x, v, frozen))
            x, v, frozen, Xc, Vc, st = fwd_jit(x, v, frozen, params, p_inv,
                                               xfs[sl], idx_f[sl])
            jax.block_until_ready(x)
            Xs.append(Xc)
            Vs.append(Vc)
            stats_parts.append(st)
        X = jnp.concatenate(Xs, axis=0)
        V = jnp.concatenate(Vs, axis=0)
        stats = tuple(jnp.concatenate(parts)
                      for parts in zip(*stats_parts))
        return X, V, stats, ins

    def _records_from_chunks(self, params, xfs, X, V, stats
                             ) -> EpisodeRecords:
        N = self.n_steps
        conv, iters, overflow, avg_def, max_def = stats
        zeros = jnp.zeros_like(X)
        return EpisodeRecords(
            x0=params.x0, v0=params.v0,
            steps=StepRecord(
                x=X, v=V, f=zeros, r=zeros,
                x_fixed=jnp.pad(
                    xfs, ((0, 0), (0, self.max_fixed - xfs.shape[1]),
                          (0, 0))) if xfs.shape[1] < self.max_fixed else xfs,
                converged=conv, iters=iters,
                avg_deformation=avg_def, max_deformation=max_def,
                selfcol_overflow=overflow))

    def rollout_chunked(self, params: SimParams,
                        chunk: int = 50) -> EpisodeRecords:
        """`rollout` with no single device execution longer than `chunk`
        steps — the safe path for long contact-rich horizons on remote-TPU
        transports.  Records match `simulate` except f/r (pre-friction force
        and friction force), which are zero-filled (no consumer outside the
        viewer overlays reads them from exported episodes)."""
        if self.n_stages > 1:
            return self.rollout(params)
        p_inv = self.p_inv(params)
        xfs = self.x_fixed_seq(params)
        X, V, stats, _ = self._chunk_forward(params, p_inv, xfs, chunk)
        return self._records_from_chunks(params, xfs, X, V, stats)

    def episode_loss_chunked(self, loss_fn, chunk: int = 50,
                             batched: bool = False):
        """Forward-only chunked loss evaluation (params -> float loss).
        Shares the compiled chunk executables with the gradient path, so a
        restart filter or a ladder's hard-loss check costs no extra
        compilation and never launches a monolithic full-horizon
        execution.

        batched=True evaluates a POPULATION: params with a leading batch
        axis on every leaf -> (B,) losses from one vmapped executable (the
        restart filter / multi-start evaluation path).  Like the batched
        gradient path, the prefactorization is shared: k_pertype/density
        must be identical across the batch."""
        if self.n_stages > 1:
            def value_multistage(params):
                return loss_fn(self.rollout(params))
            return value_multistage

        if batched:
            chunk_b = self._chunk_size(chunk)
            fwd_jit, _ = self._chunk_execs(chunk_b, batched=True)
            N = self.n_steps

            def value_batched(params_b):
                p0 = jax.tree.map(lambda a: a[0], params_b)
                p_inv = self._p_inv_fn(p0.k_pertype, p0.density)
                xfs = jax.vmap(self.x_fixed_seq)(params_b)
                idx_f = jnp.arange(1, N + 1, dtype=self.dtype)
                x, v = params_b.x0, params_b.v0
                frozen = jnp.zeros((x.shape[0],), bool)
                Xs, Vs = [], []
                for c in range(N // chunk_b):
                    sl = slice(c * chunk_b, (c + 1) * chunk_b)
                    x, v, frozen, Xc, Vc, _ = fwd_jit(
                        x, v, frozen, params_b, p_inv, xfs[:, sl],
                        idx_f[sl])
                    jax.block_until_ready(x)
                    Xs.append(Xc)
                    Vs.append(Vc)
                X = jnp.concatenate(Xs, axis=1)
                V = jnp.concatenate(Vs, axis=1)

                def one_loss(Xb, Vb, xfsb, pb):
                    recs = EpisodeRecords(
                        x0=pb.x0, v0=pb.v0,
                        steps=StepRecord(
                            x=Xb, v=Vb, f=jnp.zeros_like(Xb),
                            r=jnp.zeros_like(Xb), x_fixed=xfsb,
                            converged=jnp.ones((N,), bool),
                            iters=jnp.zeros((N,), jnp.int32),
                            avg_deformation=jnp.ones((N,), Xb.dtype),
                            max_deformation=jnp.ones((N,), Xb.dtype),
                            selfcol_overflow=jnp.zeros((N,), bool)))
                    return loss_fn(recs)

                return jax.jit(jax.vmap(one_loss))(X, V, xfs, params_b)

            return value_batched

        def value(params):
            p_inv = self.p_inv(params)
            xfs = self.x_fixed_seq(params)
            X, V, stats, _ = self._chunk_forward(params, p_inv, xfs, chunk)
            recs = self._records_from_chunks(params, xfs, X, V, stats)
            return loss_fn(recs)

        return value

    def episode_value_and_grad_chunked(self, loss_fn, chunk: int = 50,
                                       batched: bool = False):
        """Episode loss + gradient with BOTH passes split into bounded
        device calls of `chunk` steps (state carried on device, adjoint
        cotangents carried between chunk VJPs host-side).

        Numerically identical to `episode_value_and_grad` (same custom-VJP
        step; the chain rule is associative over chunks) but no single XLA
        execution covers more than `chunk` steps — required on remote-TPU
        transports that kill long-running executions, and the natural
        checkpointing granularity for horizons whose full residual stack
        would not fit HBM.  The analog of the reference's per-step
        runBackwardTask loop (Simulation.cpp:3853-3961), which is also
        host-driven step by step.

        `batched=True` vmaps every device call over a leading batch axis of
        the params pytree (a population of rollouts on one chip — the
        distributed-L-BFGS inner loop).  The prefactorization is shared, so
        k_pertype/density must be identical across the batch; everything
        else (wind, splines, x0, ...) may vary per rollout.
        """
        if self.n_stages > 1:
            # multi-stage horizons in the reference configs are short; the
            # monolithic gradient (segmented scans) is both simpler and
            # exactly what chunking would reproduce
            return self.episode_value_and_grad(loss_fn)
        N = self.n_steps
        chunk = self._chunk_size(chunk)
        n_chunks = N // chunk

        # the chunk executables are loss-independent; cache them on the sim
        # so swapping the loss (e.g. a keypoint-softmax tau ladder) reuses
        # the expensive compiled scan + VJP and only recompiles the cheap
        # loss-over-records gradient below
        fwd_jit, bwd_jit = self._chunk_execs(chunk, batched)

        def records_loss(X, V, xfs, params):
            recs = EpisodeRecords(
                x0=params.x0, v0=params.v0,
                steps=StepRecord(
                    x=X, v=V, f=jnp.zeros_like(X), r=jnp.zeros_like(X),
                    x_fixed=xfs,
                    converged=jnp.ones((N,), bool),
                    iters=jnp.zeros((N,), jnp.int32),
                    avg_deformation=jnp.ones((N,), X.dtype),
                    max_deformation=jnp.ones((N,), X.dtype),
                    selfcol_overflow=jnp.zeros((N,), bool)))
            return loss_fn(recs)

        vgl = jax.value_and_grad(records_loss, argnums=(0, 1, 3))
        loss_grads = jax.jit(jax.vmap(vgl) if batched else vgl)
        t_ax = 1 if batched else 0   # time axis of stacked arrays

        def tsl(a, sl):
            return a[:, sl] if batched else a[sl]

        def value_and_grad(params):
            if batched:
                p0 = jax.tree.map(lambda a: a[0], params)
                p_inv = self._p_inv_fn(p0.k_pertype, p0.density)
                xfs, pull_xfs = jax.vjp(jax.vmap(self.x_fixed_seq), params)
            else:
                p_inv = self._p_inv_fn(params.k_pertype, params.density)
                xfs, pull_xfs = jax.vjp(self.x_fixed_seq, params)
            idx_f = jnp.arange(1, N + 1, dtype=self.dtype)

            # forward, chunked (frozen explosion flag carried between
            # chunks exactly like inside `simulate`'s scan)
            x, v = params.x0, params.v0
            frozen = (jnp.zeros((x.shape[0],), bool) if batched
                      else jnp.asarray(False))
            ins, Xs, Vs = [], [], []
            for c in range(n_chunks):
                sl = slice(c * chunk, (c + 1) * chunk)
                ins.append((x, v, frozen))
                x, v, frozen, Xc, Vc, _ = fwd_jit(
                    x, v, frozen, params, p_inv, tsl(xfs, sl), idx_f[sl])
                jax.block_until_ready(x)
                Xs.append(Xc)
                Vs.append(Vc)
            X = jnp.concatenate(Xs, axis=t_ax)
            V = jnp.concatenate(Vs, axis=t_ax)

            # per-frame loss cotangents
            L, (dLdX, dLdV, gp_loss) = loss_grads(X, V, xfs, params)

            # backward, chunked (reverse)
            cot_x = jnp.zeros_like(x)
            cot_v = jnp.zeros_like(v)
            g_params = gp_loss
            g_xfs = jnp.zeros_like(xfs)
            for c in reversed(range(n_chunks)):
                sl = slice(c * chunk, (c + 1) * chunk)
                x_in, v_in, frozen_in = ins[c]
                gx, gv, gp, gxf = bwd_jit(
                    x_in, v_in, frozen_in, params, p_inv, tsl(xfs, sl),
                    idx_f[sl],
                    (cot_x, cot_v, tsl(dLdX, sl), tsl(dLdV, sl)))
                jax.block_until_ready(gx)
                cot_x, cot_v = gx, gv
                g_params = jax.tree.map(jnp.add, g_params, gp)
                g_xfs = (g_xfs.at[:, sl].add(gxf) if batched
                         else g_xfs.at[sl].add(gxf))

            # chain x_fixed trajectory -> spline params; initial-state grads
            g_params = jax.tree.map(jnp.add, g_params, pull_xfs(g_xfs)[0])
            g_params = g_params._replace(x0=g_params.x0 + cot_x,
                                         v0=g_params.v0 + cot_v)
            return L, g_params

        return value_and_grad

    def episode_value_and_grad(self, loss_fn):
        """Returns jitted params -> (loss, dparams).  `loss_fn(records)` is a
        scalar function of the stacked records (see losses.py).

        p_inv enters as data (zero cotangent in the step VJP): gradients
        w.r.t. k/density flow through the operator-form residual, mirroring
        the reference's reuse of the forward factorization as a fixed-point
        operator rather than differentiating through it."""

        @functools.partial(jax.jit, static_argnums=())
        def inner(params, p_inv):
            recs = self.simulate(params, p_inv, self.x_fixed_seq(params))
            return loss_fn(recs)

        grad_fn = jax.jit(jax.value_and_grad(inner))

        def value_and_grad(params):
            # refactorization happens host-side per evaluation (f64, exact);
            # gradients w.r.t. k/density flow through the operator-form
            # residual, not through P^{-1} (which only preconditions)
            p_inv = self._p_inv_fn(params.k_pertype, params.density)
            return grad_fn(params, p_inv)

        return value_and_grad
