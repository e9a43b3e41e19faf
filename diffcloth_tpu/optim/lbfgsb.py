"""Box-constrained L-BFGS-B driver with the reference hyperparameters.

reference: BackwardTaskSolver::optimizeLBFGS (BackwardTaskSolver.cpp:22-66)
runs LBFGSpp::LBFGSBSolver with delta=1e-3 (relative objective decrease with
a max(1,|f|) floor), m=10, max_linesearch=20.  scipy's L-BFGS-B exposes the
same knobs (ftol/factr is the identical criterion), so the host-side
optimizer runs on scipy while loss/gradient evaluations run on device.

The default ftol here is 1e-6, tighter than the reference's 1e-3: the
criterion's max(1,|f|) floor makes 1e-3 an *absolute* threshold once the
loss is below 1, which for task losses starting < 1 halts before any real
progress.  Evaluations are cheap on TPU (batched, ~seconds), so the tighter
tolerance trades negligible wall-clock for parity-grade convergence; pass
ftol=1e-3 for strict reference behavior.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import numpy as np
from scipy.optimize import minimize


@dataclasses.dataclass
class LbfgsResult:
    x: np.ndarray
    loss: float
    n_iters: int
    n_evals: int
    converged: bool
    message: str
    loss_history: List[float]


def _two_loop(g, S, Y, rho):
    """Standard L-BFGS two-loop recursion: returns H·g."""
    q = g.copy()
    alphas = []
    for s, y, r in zip(reversed(S), reversed(Y), reversed(rho)):
        a = r * np.dot(s, q)
        alphas.append(a)
        q -= a * y
    if S:
        gamma = np.dot(S[-1], Y[-1]) / max(np.dot(Y[-1], Y[-1]), 1e-30)
        q *= gamma
    for (s, y, r), a in zip(zip(S, Y, rho), reversed(alphas)):
        b = r * np.dot(y, q)
        q += (a - b) * s
    return q


def minimize_lbfgsb_native(loss_and_grad, x0, lower, upper, *,
                           ftol: float = 1e-6, m: int = 10,
                           max_linesearch: int = 20, gtol: float = 1e-10,
                           maxiter: int = 100,
                           callback=None) -> LbfgsResult:
    """Projected L-BFGS-B: two-loop recursion + Armijo backtracking along
    the projected arc x(a) = clip(x - a*Hg, bounds).

    Written from scratch (no scipy) because scipy's Fortran linesearch
    aborts on this problem family's first iteration (huge curvature change
    across the box, f32-quantized objective); a projected-arc backtracking
    search is robust to both.  Runs in the unit box like the scipy path."""
    lower = np.asarray(lower, np.float64)
    upper = np.asarray(upper, np.float64)
    rng = np.where(upper - lower > 0, upper - lower, 1.0)

    def to_phys(z):
        return lower + z * rng

    history: List[float] = []

    def fun(z):
        L, g = loss_and_grad(to_phys(z))
        history.append(float(L))
        return float(L), np.asarray(g, np.float64) * rng

    z = (np.clip(np.asarray(x0, np.float64), lower, upper) - lower) / rng
    f, g = fun(z)
    S: List[np.ndarray] = []
    Y: List[np.ndarray] = []
    rho: List[float] = []
    n_iters = 0
    converged = False
    message = "max iterations reached"
    for it in range(maxiter):
        d = -_two_loop(g, S, Y, rho)
        if np.dot(d, g) > -1e-15:      # not a descent direction: reset
            S.clear(); Y.clear(); rho.clear()
            d = -g
        # Trial-step schedule: L-BFGS directions are well-scaled (start at
        # alpha=1), but on the first/reset iteration d = -g can be tiny in
        # the unit box; with an f32-quantized objective a microscopic step
        # shows zero decrease and pure backtracking starves.  Scale the
        # first trial to move ~10% of the box, and scan a geometric ladder
        # both below AND above it.
        d_inf = np.linalg.norm(d, np.inf)
        alpha0 = 1.0 if S else min(1.0, 0.1 / max(d_inf, 1e-30))
        ladder = [alpha0 * (0.25 ** k)
                  for k in range(max_linesearch - 4)]
        ladder += [alpha0 * (4.0 ** k) for k in range(1, 5)
                   if alpha0 * (4.0 ** k) * d_inf <= 1.0]
        accepted = False
        for alpha in ladder:
            zn = np.clip(z + alpha * d, 0.0, 1.0)
            step = zn - z
            sn = np.dot(g, step)
            if sn >= 0 or not np.any(step):
                continue
            fn, gn = fun(zn)
            if np.isfinite(fn) and fn <= f + 1e-4 * sn:
                accepted = True
                break
        if not accepted:
            message = "linesearch failed"
            converged = np.linalg.norm(
                np.clip(z - g, 0.0, 1.0) - z, np.inf) <= max(gtol, 1e-8)
            break
        s, y = zn - z, gn - g
        sy = np.dot(s, y)
        if sy > 1e-10 * np.linalg.norm(s) * np.linalg.norm(y):
            S.append(s); Y.append(y); rho.append(1.0 / sy)
            if len(S) > m:
                S.pop(0); Y.pop(0); rho.pop(0)
        n_iters += 1
        if callback is not None:
            callback(n_iters, to_phys(zn))
        df = f - fn
        z, f, g = zn, fn, gn
        # reference convergence test: |f-f'| <= delta*max(1,|f|,|f'|)
        if df <= ftol * max(1.0, abs(f), abs(f + df)):
            converged = True
            message = "relative reduction of f <= ftol"
            break
        pg = np.linalg.norm(np.clip(z - g, 0.0, 1.0) - z, np.inf)
        if pg <= gtol:
            converged = True
            message = "projected gradient <= gtol"
            break
    return LbfgsResult(x=to_phys(z), loss=f, n_iters=n_iters,
                       n_evals=len(history), converged=bool(converged),
                       message=message, loss_history=history)


def minimize_lbfgsb(loss_and_grad: Callable[[np.ndarray],
                                            Tuple[float, np.ndarray]],
                    x0: np.ndarray, lower: np.ndarray, upper: np.ndarray,
                    *, ftol: float = 1e-6, m: int = 10,
                    max_linesearch: int = 20, gtol: float = 1e-12,
                    maxiter: int = 100,
                    callback: Optional[Callable[[int, np.ndarray],
                                                None]] = None,
                    backend: str = "native") -> LbfgsResult:
    """`callback(iteration, x)` fires once per L-BFGS iteration — the
    checkpoint hook (reference saveLastIter, OptimizeHelper.cpp:528-533).

    The solver runs in the unit box: parameters are affinely mapped to
    [0,1]^d by their bounds (gradients by the chain rule).  The physical
    parameters span 5+ orders of magnitude in range (wind +-0.1 vs stiffness
    ~1e3) and in gradient scale, which makes the raw box so anisotropic
    that the generalized Cauchy point lands on a corner and the first
    linesearch collapses; unit-box scaling is the standard conditioner
    (the reference gets a weaker version from its log-scale transform on
    selected parameters, OptimizeHelper.cpp:58,113,124).

    backend="native" (default) uses the from-scratch projected L-BFGS-B
    above, whose projected-arc backtracking is robust where scipy's Fortran
    linesearch aborts; backend="scipy" keeps the Fortran path."""
    if backend == "native":
        return minimize_lbfgsb_native(
            loss_and_grad, x0, lower, upper, ftol=ftol, m=m,
            max_linesearch=max_linesearch, gtol=max(gtol, 1e-12),
            maxiter=maxiter, callback=callback)
    history: List[float] = []
    it_count = [0]

    lower = np.asarray(lower, np.float64)
    upper = np.asarray(upper, np.float64)
    rng = upper - lower
    rng = np.where(rng > 0, rng, 1.0)

    def to_phys(z):
        return lower + z * rng

    def fun(z):
        L, g = loss_and_grad(to_phys(z))
        history.append(L)
        return L, np.asarray(g, np.float64) * rng

    def cb(zk):
        it_count[0] += 1
        if callback is not None:
            callback(it_count[0], to_phys(np.asarray(zk)))

    z0 = (np.clip(np.asarray(x0, np.float64), lower, upper) - lower) / rng
    res = minimize(
        fun, z0, jac=True, method="L-BFGS-B",
        bounds=[(0.0, 1.0)] * z0.shape[0], callback=cb,
        options=dict(ftol=ftol, maxcor=m, maxls=max_linesearch,
                     gtol=gtol, maxiter=maxiter))
    return LbfgsResult(x=to_phys(res.x), loss=float(res.fun),
                       n_iters=int(res.nit),
                       n_evals=int(res.nfev), converged=bool(res.success),
                       message=str(res.message), loss_history=history)
