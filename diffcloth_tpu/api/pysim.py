"""Python API parity layer — the `diffcloth_py` surface, JAX-native.

reference: src/code/python_interface.cpp (module `diffcloth_py`,
:164-378) and PySimulations.h.  `make_sim` / `make_optimize_helper` mirror
`makeSim` / `makeOptimizeHelper` (python_interface.cpp:12-89,137);
`SimulationAPI` is the stateful `Simulation` facade with `stepNN` /
`stepBackwardNN` semantics used by the closed-loop NN controllers.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffcloth_tpu.core.types import SimParams
from diffcloth_tpu.geometry import objio
from diffcloth_tpu.optim.helper import OptimizeHelper
from diffcloth_tpu.tasks.setup import TaskSetup, build_task

# reference demo names (python_interface.cpp:12-89 wires "wear_hat" and
# "wear_sock"; the rest map to the CLI demos)
_EXAMPLES = {
    "wear_hat": "hat",
    "wear_sock": "sock",
    "wind_tshirt": "tshirt",
    "wind": "wind",
    "rotating_sphere": "sphere",
    "dress_twirl": "dress",
    "slope": "slope",
}


class StateInfo(NamedTuple):
    """reference: ForwardInformation subset exposed to Python."""
    x: np.ndarray             # (3n,) flattened, reference layout
    v: np.ndarray
    x_fixedpoints: np.ndarray  # (3F,)
    t: float
    stepIdx: int
    converged: bool
    avgDeformation: float
    maxDeformation: float


class SimulationAPI:
    """Stateful facade over the functional ClothSim, mirroring the
    reference `Simulation` object held by Python controllers."""

    def __init__(self, task: TaskSetup):
        self.task = task
        self.sim = task.sim
        self.params = task.param_base
        self._p_inv = self.sim.p_inv(self.params)
        self.ndof_u = 3 * len(self.sim.stage_host.particle_idx)
        self.scene_config = self.sim.cfg
        self.primitives = self.sim.prims
        self.forward_records: List[StateInfo] = []
        self.reset_system()

    # ------------------------------------------------------------- state

    def _push_record(self, x, v, x_fixed, step_idx, converged=True,
                     avg_def=1.0, max_def=1.0):
        self.forward_records.append(StateInfo(
            x=np.asarray(x).reshape(-1),
            v=np.asarray(v).reshape(-1),
            x_fixedpoints=np.asarray(x_fixed).reshape(-1),
            t=step_idx * self.sim.h, stepIdx=step_idx,
            converged=bool(converged), avgDeformation=float(avg_def),
            maxDeformation=float(max_def)))

    def reset_system(self) -> None:
        """reference: Simulation::resetSystem (Simulation.cpp:2834-2845)."""
        p = self.params
        self._x = p.x0
        self._v = p.v0
        self._x_fixed = self.sim.stage_dev.fixed_pos_rest.astype(
            self.sim.dtype)
        self._step_idx = 0
        self.forward_records = []
        self._push_record(self._x, self._v, self._x_fixed, 0)

    def get_state_info(self) -> StateInfo:
        return self.forward_records[-1]

    def get_current_pos_velocity_vec(self) -> Tuple[np.ndarray, np.ndarray]:
        return (np.asarray(self._x).reshape(-1),
                np.asarray(self._v).reshape(-1))

    def set_params(self, params: SimParams) -> None:
        """resetSystemWithParams analogue: refactorizes the solver."""
        self.params = params
        self._p_inv = self.sim.p_inv(params)
        self.reset_system()

    # ------------------------------------------------------------ stepping

    def step(self) -> StateInfo:
        """Autonomous step using the scene's own trajectory config."""
        xfs = self.sim.x_fixed_seq(self.params)
        i = min(self._step_idx, xfs.shape[0] - 1)
        return self.step_nn(self._step_idx + 1, self._x, self._v, xfs[i])

    def step_nn(self, idx: int, x, v, fixed_point_pos) -> StateInfo:
        """reference: Simulation::stepNN (Simulation.cpp:1020-1041) — one
        step with externally-set clip targets (PER_STEP_TRAJECTORY)."""
        x = jnp.asarray(x, self.sim.dtype).reshape(-1, 3)
        v = jnp.asarray(v, self.sim.dtype).reshape(-1, 3)
        a = jnp.asarray(fixed_point_pos, self.sim.dtype).reshape(-1, 3)
        t = jnp.asarray(idx * self.sim.h, self.sim.dtype)
        x2, v2, aux = self.sim.step(x, v, self.params, a, self._p_inv, t,
                                    jnp.asarray(float(idx), self.sim.dtype))
        self._x, self._v, self._x_fixed = x2, v2, a
        self._step_idx = idx
        self._push_record(x2, v2, a, idx, aux.converged,
                          aux.avg_deformation, aux.max_deformation)
        return self.get_state_info()

    def step_backward_nn(self, idx: int, x, v, a, dL_dx_new, dL_dv_new
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """reference: Simulation::stepBackwardNN (Simulation.cpp:1443-1452):
        per-step adjoint returning (dL/dx, dL/dv, dL/dxfixed).  Implemented
        by re-linearizing the step at the saved inputs — the custom-VJP
        implicit adjoint does the actual solve."""
        x = jnp.asarray(x, self.sim.dtype).reshape(-1, 3)
        v = jnp.asarray(v, self.sim.dtype).reshape(-1, 3)
        a = jnp.asarray(a, self.sim.dtype).reshape(-1, 3)
        gx = jnp.asarray(dL_dx_new, self.sim.dtype).reshape(-1, 3)
        gv = jnp.asarray(dL_dv_new, self.sim.dtype).reshape(-1, 3)
        t = jnp.asarray(idx * self.sim.h, self.sim.dtype)

        def fwd(x_, v_, a_):
            x2, v2, _ = self.sim.step(x_, v_, self.params, a_, self._p_inv,
                                      t, jnp.asarray(float(idx),
                                                     self.sim.dtype))
            return x2, v2

        _, vjp = jax.vjp(fwd, x, v, a)
        dx, dv, da = vjp((gx, gv))
        return (np.asarray(dx).reshape(-1), np.asarray(dv).reshape(-1),
                np.asarray(da).reshape(-1))

    # ------------------------------------------------------------- export

    def export_current_simulation(self, name: str,
                                  folder: str = "output") -> str:
        """reference: exportCurrentSimulation -> per-frame OBJ files."""
        import os
        path = os.path.join(folder, name)
        xs = np.stack([r.x.reshape(-1, 3) for r in self.forward_records])
        objio.export_frames(path, xs, self.sim.scene_host.tris)
        return path


def make_sim(example_name: str, run_backward: bool = True,
             dtype=None) -> SimulationAPI:
    """reference: makeSim (python_interface.cpp:12-89, :367)."""
    demo = _EXAMPLES.get(example_name, example_name)
    task = build_task(demo, dtype=dtype or jnp.float32)
    return SimulationAPI(task)


def make_optimize_helper(example_name: str,
                         sim: Optional[SimulationAPI] = None
                         ) -> OptimizeHelper:
    """reference: makeOptimizeHelper (python_interface.cpp:137, :369)."""
    if sim is None:
        sim = make_sim(example_name)
    task = sim.task
    return OptimizeHelper(task.sim, task.mask, task.loss_fn(),
                          param_base=task.param_base)
