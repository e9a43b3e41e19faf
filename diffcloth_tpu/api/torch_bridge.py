"""PyTorch autograd bridge — parity with the reference pySim module.

reference: src/python_code/pySim/functional.py (SimFunction, :18-102) and
pySim/pySim.py (:12-33).  forward = one PD step with externally-set clip
targets; backward = the per-step implicit adjoint returning
(dL/dx, dL/dv, dL/da), with the reference's dL/da norm clamp
(functional.py:89-99).

The Python<->C++ pybind crossing of the reference becomes a
torch<->JAX crossing (numpy copies, once per step in each direction,
exactly like the reference's boundary at functional.py:34-37).
"""
from __future__ import annotations

from typing import Any, Tuple

import numpy as np

try:
    import torch
    from torch import Tensor
    import torch.autograd as autograd
    import torch.nn as nn
    _HAS_TORCH = True
except Exception:  # pragma: no cover - torch is in the base image
    _HAS_TORCH = False

from diffcloth_tpu.api.pysim import SimulationAPI


if _HAS_TORCH:

    class SimFunction(autograd.Function):
        """torch.autograd.Function over one simulator step
        (reference: pySim/functional.py:18-102)."""

        @staticmethod
        def forward(ctx: Any, x: Tensor, v: Tensor, a: Tensor,
                    sim: SimulationAPI) -> Tuple[Tensor, Tensor]:
            ctx.sim = sim
            past = sim.get_state_info()
            ctx.idx = past.stepIdx + 1
            arg_x = np.float64(x.contiguous().detach().cpu().numpy())
            arg_v = np.float64(v.contiguous().detach().cpu().numpy())
            arg_a = np.float64(a.contiguous().detach().cpu().numpy())
            rec = sim.step_nn(ctx.idx, arg_x, arg_v, arg_a)
            ctx.save_for_backward(x, v, a)
            x_next = torch.as_tensor(rec.x.copy()).float()
            v_next = torch.as_tensor(rec.v.copy()).float()
            return x_next, v_next

        @staticmethod
        def backward(ctx: Any, dL_dx_next: Tensor, dL_dv_next: Tensor):
            x, v, a = ctx.saved_tensors
            sim = ctx.sim
            gx = dL_dx_next.contiguous().detach().cpu().numpy()
            gv = dL_dv_next.contiguous().detach().cpu().numpy()
            dx, dv, da = sim.step_backward_nn(
                ctx.idx, x.detach().cpu().numpy(), v.detach().cpu().numpy(),
                a.detach().cpu().numpy(), gx, gv)
            # dL/da norm clamp (functional.py:89-99)
            da_norm = float(np.linalg.norm(da))
            if da_norm > 1e-7:
                max_norm = sim.sim.flags.action_grad_max_norm
                target = max(min(da.shape[0] * max_norm, da_norm), 0.05)
                da = da * (target / da_norm)
            return (torch.as_tensor(dx), torch.as_tensor(dv),
                    torch.as_tensor(da), None)

    class PySim(nn.Module):
        """nn.Module wrapper (reference: pySim/pySim.py:12-33)."""

        def __init__(self, sim: SimulationAPI):
            super().__init__()
            self.sim = sim

        def forward(self, x: Tensor, v: Tensor, a: Tensor
                    ) -> Tuple[Tensor, Tensor]:
            return SimFunction.apply(x, v, a, self.sim)
