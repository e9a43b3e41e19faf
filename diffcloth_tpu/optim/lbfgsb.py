"""Box-constrained L-BFGS-B driver with the reference hyperparameters.

reference: BackwardTaskSolver::optimizeLBFGS (BackwardTaskSolver.cpp:22-66)
runs LBFGSpp::LBFGSBSolver with delta=1e-3 (relative objective decrease),
m=10, max_linesearch=20.  scipy's L-BFGS-B exposes the same knobs (ftol is
the identical relative-decrease criterion), so the host-side optimizer runs
on scipy while loss/gradient evaluations run on device.  A from-scratch C++
implementation can slot in behind the same interface (native/).
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


def minimize_lbfgsb(loss_and_grad: Callable[[np.ndarray],
                                            Tuple[float, np.ndarray]],
                    x0: np.ndarray, lower: np.ndarray, upper: np.ndarray,
                    *, ftol: float = 1e-3, m: int = 10,
                    max_linesearch: int = 20, gtol: float = 1e-12,
                    maxiter: int = 100,
                    callback: Optional[Callable[[int, np.ndarray],
                                                None]] = None) -> LbfgsResult:
    """`callback(iteration, x)` fires once per L-BFGS iteration — the
    checkpoint hook (reference saveLastIter, OptimizeHelper.cpp:528-533)."""
    history: List[float] = []
    it_count = [0]

    def fun(x):
        L, g = loss_and_grad(x)
        history.append(L)
        return L, np.asarray(g, np.float64)

    def cb(xk):
        it_count[0] += 1
        if callback is not None:
            callback(it_count[0], np.asarray(xk))

    res = minimize(
        fun, np.asarray(x0, np.float64), jac=True, method="L-BFGS-B",
        bounds=list(zip(lower, upper)), callback=cb,
        options=dict(ftol=ftol, maxcor=m, maxls=max_linesearch,
                     gtol=gtol, maxiter=maxiter))
    return LbfgsResult(x=res.x, loss=float(res.fun), n_iters=int(res.nit),
                       n_evals=int(res.nfev), converged=bool(res.success),
                       message=str(res.message), loss_history=history)
