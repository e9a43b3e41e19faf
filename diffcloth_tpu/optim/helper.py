"""Parameter-vector packing, bounds, random restarts, and the optimization
objective — the reference `OptimizeHelper` (OptimizeHelper.{h,cpp}).

A `GradMask` (reference `BackwardTaskInformation`, Simulation.h:188-209)
selects which entries of `SimParams` are exposed to the box-constrained
optimizer; packing order and bounds tables mirror
`OptimizeHelper::setParameterBounds` (OptimizeHelper.cpp:47-171).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffcloth_tpu.core.types import SimParams

# per-type stiffness bounds [spring, attach, stretch, bend]
# (OptimizeHelper.cpp:81-84)
STIFFNESS_BOUNDS = [(0.0, 200.0), (63.0, 10000.0), (80.0, 1500.0), (1e-7, 5.0)]


@dataclasses.dataclass(frozen=True)
class GradMask:
    """Which parameters the task optimizes (BackwardTaskInformation)."""
    k_pertype: Tuple[bool, bool, bool, bool] = (False, False, False, False)
    density: bool = False
    f_ext: bool = False          # constant wind vector (3)
    f_wind: bool = False         # sinusoidal wind 5-vector
    x0: bool = False
    force_field: bool = False
    wind_perstep: bool = False
    control_points: bool = False
    mu_primitives: Tuple[int, ...] = ()


@dataclasses.dataclass
class _Slot:
    name: str
    path: str                # SimParams field
    index: object            # index into the field (or slice)
    lo: float
    hi: float


class OptimizeHelper:
    """Flat parameter vector <-> SimParams, with bounds and restarts.

    reference: OptimizeHelper.cpp — paramInfoToVecXd (:179-246),
    vecXdToParamInfo (:361-420), parameterFromRandSeed (:316-359),
    getRandomParam (:445-488), operator() (:535-573).
    """

    def __init__(self, sim, mask: GradMask, loss_fn,
                 param_base: Optional[SimParams] = None,
                 chunked: Optional[bool] = None, chunk: int = 50):
        self.sim = sim
        self.mask = mask
        self.loss_fn = loss_fn
        self.base = param_base if param_base is not None else \
            sim.default_params()
        self._slots: List[_Slot] = []
        self._build_slots()
        # chunked episode adjoint for long horizons and large meshes: one
        # fused forward+backward executable over 300+ contact steps (or a
        # 3k+-vertex mesh) exceeds remote-TPU execution limits
        # (see episode_value_and_grad_chunked)
        if chunked is None:
            chunked = sim.n_steps > 250 or sim.n > 2000
        self.chunked = chunked
        self.chunk = chunk
        self._vg = (sim.episode_value_and_grad_chunked(loss_fn, chunk=chunk)
                    if chunked else sim.episode_value_and_grad(loss_fn))
        self._loss_eval = (sim.episode_loss_chunked(loss_fn, chunk=chunk)
                           if chunked else None)
        self.eval_count = 0
        self.history: List[Tuple[float, np.ndarray]] = []

    # -------------------------------------------------------------- layout

    def _build_slots(self):
        s = self._slots
        bbox = self.sim.cfg.scene_bbox
        if self.mask.f_wind:
            for i in range(3):
                s.append(_Slot("windForce", "wind", (i,), -0.1, 0.1))
            s.append(_Slot("windFreq", "wind_freq", (), 0.01, 15.0))
            s.append(_Slot("windPhase", "wind_phase", (), -5.0, 5.0))
        if self.mask.f_ext:
            for i in range(3):
                s.append(_Slot("windDir", "wind", (i,), -3.0, 3.0))
        if self.mask.wind_perstep:
            # per-step wind factor (reference packing OptimizeHelper.cpp:190,
            # gradient Simulation.cpp:1722-1730).  The reference declares no
            # bounds for this group (parameterFromRandSeed logs
            # "dL_dwindFactor not handled", OptimizeHelper.cpp:351-353); the
            # sinusoidal factor it replaces lives in [0, 1], so allow [-2, 2]
            for t in range(int(self.base.wind_perstep.shape[0])):
                s.append(_Slot("windFactorPerStep", "wind_perstep", (t,),
                               -2.0, 2.0))
        if self.mask.x0:
            for p in range(self.sim.n):
                for d in range(3):
                    s.append(_Slot("x0", "x0", (p, d), bbox.lo[d], bbox.hi[d]))
        if self.mask.force_field:
            for p in range(self.sim.n):
                for d in range(3):
                    s.append(_Slot("forceField", "force_field", (p, d),
                                   -10.0, 10.0))
        for t in range(4):
            if self.mask.k_pertype[t]:
                lo, hi = STIFFNESS_BOUNDS[t]
                s.append(_Slot(f"k[{t}]", "k_pertype", (t,), lo, hi))
        if self.mask.density:
            s.append(_Slot("density", "density", (), 0.01, 1.0))
        if self.mask.control_points:
            # ENDPOINT_AND_TANGENTS: per fixed point (p1, m0, m1)
            # bounds: p1 in scene bbox, tangents in [-50, 50]
            # (Spline.h:99-105)
            F = self.base.spline.shape[0]
            for f in range(F):
                for d in range(3):
                    s.append(_Slot("spline_p1", "spline", (f, d),
                                   bbox.lo[d], bbox.hi[d]))
                for j in range(3, 9):
                    s.append(_Slot("spline_m", "spline", (f, j), -50.0, 50.0))
        for prim_id in self.mask.mu_primitives:
            s.append(_Slot(f"mu[{prim_id}]", "mu", (prim_id,), 0.01, 0.95))

    @property
    def n_params(self) -> int:
        return len(self._slots)

    @property
    def lower_bound(self) -> np.ndarray:
        return np.array([sl.lo for sl in self._slots])

    @property
    def upper_bound(self) -> np.ndarray:
        return np.array([sl.hi for sl in self._slots])

    # ------------------------------------------------------------- packing

    def params_to_vec(self, params: SimParams) -> np.ndarray:
        x = np.zeros(self.n_params)
        for i, sl in enumerate(self._slots):
            leaf = np.asarray(getattr(params, sl.path))
            x[i] = leaf[sl.index] if sl.index != () else float(leaf)
        return x

    def vec_to_params(self, x: np.ndarray) -> SimParams:
        params = self.base
        updates = {}
        for i, sl in enumerate(self._slots):
            arr = updates.get(sl.path)
            if arr is None:
                arr = np.array(getattr(params, sl.path), np.float64)
                updates[sl.path] = arr
            if sl.index == ():
                updates[sl.path] = np.float64(x[i])
            else:
                arr[sl.index] = x[i]
        cast = {k: jnp.asarray(v, self.sim.dtype) for k, v in updates.items()}
        return params._replace(**cast)

    def grads_to_vec(self, grads: SimParams) -> np.ndarray:
        return self.params_to_vec(grads)

    # ------------------------------------------------------------ restarts

    def random_param(self, seed: int) -> np.ndarray:
        """Bounded random restart with the reference's validity fixups
        (OptimizeHelper.cpp:316-359, 445-488).  numpy RNG instead of C
        rand() — same distribution, different stream."""
        rng = np.random.RandomState(seed)
        while True:
            u = rng.uniform(0.0, 1.0, self.n_params)
            x = self.lower_bound + u * (self.upper_bound - self.lower_bound)
            params = self.vec_to_params(x)
            if self.mask.control_points:
                # force all splines to share one random endpoint translation
                # (reduces the init search space, OptimizeHelper.cpp:324-339)
                base_sp = np.asarray(self.base.spline)
                cand_sp = np.asarray(params.spline)
                delta = cand_sp[0, 0:3] - base_sp[0, 0:3]
                sp = base_sp.copy()
                p0 = np.asarray(self.sim.stage_dev.spline_p0)
                yup = np.asarray(self.sim.stage_dev.spline_yup)
                p1 = base_sp[:, 0:3] + delta[None, :]
                d = p1 - p0
                up = np.zeros_like(d)
                up[:, 1] = yup
                sp = np.concatenate([p1, d + up, d - up], axis=1)
                params = params._replace(
                    spline=jnp.asarray(sp, self.sim.dtype))
            if self.mask.f_ext:
                w = np.asarray(params.wind, np.float64)
                norm = np.linalg.norm(w)
                if norm > 1.0:
                    params = params._replace(
                        wind=jnp.asarray(w / norm, self.sim.dtype))
            if self.mask.f_wind:
                w = np.asarray(params.wind, np.float64)
                norm = np.linalg.norm(w)
                if norm > 2.0:
                    params = params._replace(
                        wind=jnp.asarray(w * 2.0 / norm, self.sim.dtype))
            x = self.params_to_vec(params)
            if np.all(x >= self.lower_bound - 1e-12) and \
                    np.all(x <= self.upper_bound + 1e-12):
                return x

    # ----------------------------------------------------------- objective

    def loss(self, x: np.ndarray) -> float:
        """Forward-only loss (restart filtering / reporting).  On the
        chunked path this shares the gradient path's compiled chunk
        executables AND its explosion-freeze semantics, so loss() and
        loss_and_grad() agree for the same x."""
        params = self.vec_to_params(x)
        if self._loss_eval is not None:
            return float(self._loss_eval(params))
        p_inv = self.sim.p_inv(params)
        recs = self.sim.simulate(params, p_inv,
                                 self.sim.x_fixed_seq(params))
        return float(self.loss_fn(recs))

    def loss_and_grad(self, x: np.ndarray) -> Tuple[float, np.ndarray]:
        params = self.vec_to_params(x)
        L, grads = self._vg(params)
        g = self.grads_to_vec(grads)
        self.eval_count += 1
        self.history.append((float(L), np.array(x)))
        return float(L), g

    # ------------------------------------------------- population (batched)

    @property
    def can_batch(self) -> bool:
        """Batched evaluation shares one prefactorization across the
        population, so parameter vectors that change P (stiffness/density)
        cannot ride the vmapped executables."""
        return not (any(self.mask.k_pertype) or self.mask.density)

    def stack_vecs(self, X: np.ndarray) -> SimParams:
        """(P, D) candidate vectors -> SimParams with a leading batch axis
        on every leaf."""
        plist = [self.vec_to_params(np.asarray(x)) for x in np.asarray(X)]
        return jax.tree.map(lambda *a: jnp.stack(a), *plist)

    def batched_loss(self, X: np.ndarray) -> np.ndarray:
        """(P, D) -> (P,) losses from ONE vmapped chunked forward (the
        restart filter: reference OptimizeHelper.cpp:316-359 evaluates
        candidates serially; a TPU evaluates the whole population for the
        price of one)."""
        if getattr(self, "_batched_loss_eval", None) is None:
            self._batched_loss_eval = self.sim.episode_loss_chunked(
                self.loss_fn, chunk=self.chunk, batched=True)
        return np.asarray(self._batched_loss_eval(self.stack_vecs(X)))

    def batched_loss_and_grad(self, X: np.ndarray
                              ) -> Tuple[np.ndarray, np.ndarray]:
        """(P, D) -> ((P,), (P, D)): one vmapped chunked episode
        value_and_grad over the whole population (the lockstep multi-start
        L-BFGS inner loop, optim.lbfgsb.minimize_lbfgsb_population)."""
        assert self.can_batch, ("population evaluation shares one "
                                "prefactorization: stiffness/density "
                                "cannot vary across candidates")
        if getattr(self, "_batched_vg", None) is None:
            self._batched_vg = self.sim.episode_value_and_grad_chunked(
                self.loss_fn, chunk=self.chunk, batched=True)
        L, grads = self._batched_vg(self.stack_vecs(X))
        P = np.asarray(X).shape[0]
        G = np.stack([self.grads_to_vec(
            jax.tree.map(lambda a: a[i], grads)) for i in range(P)])
        self.eval_count += P
        return np.asarray(L, np.float64), G
