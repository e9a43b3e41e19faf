"""Hierarchical wall-clock timing + device profiling.

TPU-native equivalent of the reference's hand-rolled `Timer`
(engine/Timer.h:11-201) and the per-episode percentage breakdown reports it
feeds (`exportStatistics`, Simulation.cpp:4003; the timing tables in
output/tshirt-exampleopt/{forward,backward}Log.txt).

Differences by design: on TPU everything inside a jitted episode fuses into
one XLA executable, so intra-step phase timing is measured either (a) at the
section level host-side around device calls (this module), or (b) with a
`jax.profiler` trace for op-level attribution (`trace()` below).  Per-step
solver statistics (PD iterations, convergence) travel in `EpisodeRecords`
instead, mirroring ForwardInformation.timer (Simulation.h:84-85).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class _Section:
    total_s: float = 0.0
    count: int = 0


@dataclass
class Timer:
    """Labeled tic/toc accumulator with nesting via '/' paths.

    reference: Timer::tic/toc with labeled sections (engine/Timer.h:30-96)
    accumulated per step and per episode.
    """
    sections: Dict[str, _Section] = field(default_factory=dict)
    _stack: List[str] = field(default_factory=list)
    _starts: List[float] = field(default_factory=list)

    def tic(self, label: str) -> None:
        path = "/".join(self._stack + [label])
        self._stack.append(label)
        self._starts.append(time.perf_counter())
        self.sections.setdefault(path, _Section())

    def toc(self) -> float:
        label = self._stack.pop()
        dt = time.perf_counter() - self._starts.pop()
        full = "/".join(self._stack + [label])
        sec = self.sections.setdefault(full, _Section())
        sec.total_s += dt
        sec.count += 1
        return dt

    @contextlib.contextmanager
    def section(self, label: str):
        self.tic(label)
        try:
            yield
        finally:
            self.toc()

    def merge(self, other: "Timer") -> None:
        for k, v in other.sections.items():
            sec = self.sections.setdefault(k, _Section())
            sec.total_s += v.total_s
            sec.count += v.count

    def report(self, title: str = "Timing") -> str:
        """Percentage-breakdown table like the reference's forwardLog.txt
        timer tables (total + per-section % of parent)."""
        total = sum(s.total_s for k, s in self.sections.items()
                    if "/" not in k)
        lines = [f"== {title}: total {total * 1e3:.1f} ms =="]
        for k in sorted(self.sections):
            s = self.sections[k]
            pct = 100.0 * s.total_s / total if total > 0 else 0.0
            indent = "  " * k.count("/")
            name = k.rsplit("/", 1)[-1]
            lines.append(f"{indent}{name:<28s} {s.total_s * 1e3:>10.2f} ms "
                         f"{pct:>6.1f}%  (x{s.count})")
        return "\n".join(lines)

    def to_dict(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": s.total_s, "count": s.count}
                for k, s in self.sections.items()}

    def dump(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(self.to_dict(), fh, indent=1)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace (view with tensorboard /
    xprof).  Op-level TPU attribution — the analog of the reference's
    per-phase solve/projection split (Macros.h:86-96)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class EpisodeStats:
    """Per-episode solver statistics mirroring the reference's forward/
    backward log records (convergeIter/cumulateIter/totalConverged,
    Simulation.h:94-98)."""
    n_steps: int = 0
    total_pd_iters: int = 0
    n_converged: int = 0
    forward_s: float = 0.0
    backward_s: float = 0.0

    @classmethod
    def from_records(cls, recs, forward_s: float = 0.0,
                     backward_s: float = 0.0) -> "EpisodeStats":
        import numpy as np
        iters = np.asarray(recs.steps.iters)
        conv = np.asarray(recs.steps.converged)
        return cls(n_steps=int(iters.shape[0]),
                   total_pd_iters=int(iters.sum()),
                   n_converged=int(conv.sum()),
                   forward_s=forward_s, backward_s=backward_s)

    def report(self) -> str:
        sps = self.n_steps / self.forward_s if self.forward_s > 0 else 0.0
        return (f"[episode] steps={self.n_steps} "
                f"PD iters={self.total_pd_iters} "
                f"({self.total_pd_iters / max(self.n_steps, 1):.1f}/step) "
                f"converged={self.n_converged}/{self.n_steps} "
                f"forward={self.forward_s * 1e3:.1f} ms ({sps:.1f} steps/s) "
                f"backward={self.backward_s * 1e3:.1f} ms")
