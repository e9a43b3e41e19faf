"""Energy diagnostics, explosion detection, finite-difference gradient checks.

Reference parity:
  - PD system energy E = 1/2 (x-s_n)^T M (x-s_n) + h^2 sum_c E_c and
    explosion detection at E > 1e6 (`evaluateEnergy`/`evaluateSystemEnergy`,
    Simulation.cpp:921-948; explosion freeze :1415-1424).
  - Central-difference gradient checking for every parameter class
    (`finiteDifferenceBackward` / `calculateFiniteDiffLossArr`,
    Simulation.cpp:3640-3786, 3587-3639) — the reference's primary
    correctness oracle (SURVEY.md section 4); here it is a library function
    used both by tests and interactively.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffcloth_tpu.core import constraints as cons
from diffcloth_tpu.core.types import SimParams

EXPLOSION_THRESHOLD = 1e6  # reference: Simulation.cpp:1417


def constraint_energy(scene, stage, k_pertype, x, x_fixed):
    """sum_c E_c with E_c = 1/2 k_t |A0_t x - p0_t(x)|^2 per constraint type
    (the PD quadratic energy at the projection; reference per-constraint
    evaluateEnergy, Constraint.h:49-84)."""
    p_s, p_b, p_a, p_sp = cons.all_projections(scene, stage, x, x_fixed)
    y_s = cons.apply_rows(scene.s_rows_idx, scene.s_rows_w, x)
    y_b = cons.apply_rows(scene.b_rows_idx, scene.b_rows_w, x)
    y_a = cons.apply_rows(stage.attach_idx, stage.attach_w, x)
    y_sp = cons.apply_rows(scene.sp_rows_idx, scene.sp_rows_w, x)
    e = 0.5 * (k_pertype[2] * jnp.sum((y_s - p_s) ** 2) +
               k_pertype[3] * jnp.sum((y_b - p_b) ** 2) +
               k_pertype[1] * jnp.sum((y_a - p_a) ** 2) +
               k_pertype[0] * jnp.sum((y_sp - p_sp) ** 2))
    return e


def system_energy(scene, stage, k_pertype, m, h, x, s_n, x_fixed):
    """E = 1/2 (x-s_n)^T M (x-s_n) + h^2 * sum_c E_c
    (reference: evaluateSystemEnergy, Simulation.cpp:939-948)."""
    d = x - s_n
    inertia = 0.5 * jnp.sum(m[:, None] * d * d)
    return inertia + h * h * constraint_energy(scene, stage, k_pertype, x,
                                               x_fixed)


def is_exploded(x, v, threshold: float = 1e4):
    """Cheap per-step numerical-failure predicate used to freeze the
    remaining rollout (reference freezes on E > 1e6,
    Simulation.cpp:1415-1424; here: non-finite state or runaway velocity)."""
    finite = jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(v))
    bounded = jnp.max(jnp.abs(v)) < threshold
    return ~(finite & bounded)


# ---------------------------------------------------------------------------
# finite differences

DEFAULT_FD_FIELDS = ("wind", "wind_freq", "wind_phase", "k_pertype",
                     "density", "mu", "spline", "x0", "v0")


def finite_difference_gradients(
        loss_of_params: Callable[[SimParams], float],
        params: SimParams,
        fields: Sequence[str] = DEFAULT_FD_FIELDS,
        delta: float = 1e-6,
        max_entries_per_field: Optional[int] = 12,
        rng: Optional[np.random.RandomState] = None) -> Dict[str, np.ndarray]:
    """Central-difference dL/dtheta per parameter field.

    `loss_of_params` runs a full episode and returns the scalar task loss
    (use a tightened forward tolerance for agreement at small delta — the
    reference tightens to 1e-9 during FD checks, Simulation.cpp:3648).
    For large fields (x0/v0/force_field) a random subset of
    `max_entries_per_field` coordinates is probed; the returned array holds
    the FD value at probed coordinates and NaN elsewhere.
    """
    rng = rng or np.random.RandomState(0)
    out: Dict[str, np.ndarray] = {}
    for name in fields:
        base = np.asarray(getattr(params, name), np.float64)
        flat = base.reshape(-1)
        k = flat.shape[0]
        if k == 0:
            out[name] = base.copy()
            continue
        probe = np.arange(k)
        if max_entries_per_field is not None and k > max_entries_per_field:
            probe = np.sort(rng.choice(k, max_entries_per_field,
                                       replace=False))
        g = np.full((k,), np.nan)
        for i in probe:
            for sgn in (+1.0, -1.0):
                pert = flat.copy()
                pert[i] += sgn * delta
                p2 = params._replace(**{
                    name: jnp.asarray(pert.reshape(base.shape),
                                      getattr(params, name).dtype)})
                li = float(loss_of_params(p2))
                g[i] = (0.0 if np.isnan(g[i]) else g[i]) + sgn * li
            g[i] /= (2.0 * delta)
        out[name] = g.reshape(base.shape)
    return out


def compare_fd_adjoint(fd: Dict[str, np.ndarray], grads: SimParams,
                       rtol: float = 5e-2, atol: float = 1e-8):
    """Elementwise FD-vs-adjoint agreement report.  Returns
    {field: (max_abs_err, max_rel_err, ok)} over the probed entries."""
    report = {}
    for name, g_fd in fd.items():
        g_ad = np.asarray(getattr(grads, name), np.float64)
        mask = np.isfinite(g_fd)
        if not mask.any():
            report[name] = (0.0, 0.0, True)
            continue
        diff = np.abs(g_fd[mask] - g_ad[mask])
        scale = np.maximum(np.abs(g_fd[mask]), np.abs(g_ad[mask]))
        rel = diff / np.maximum(scale, atol / rtol)
        report[name] = (float(diff.max()), float(rel.max()),
                        bool(np.all(diff <= atol + rtol * scale)))
    return report
