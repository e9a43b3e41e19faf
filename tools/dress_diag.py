"""Dress optimization diagnosis (VERDICT r4 #4):

1. real FD-vs-adjoint comparison of dL/d(k_bend) and dL/d(density) at the
   initial guess (not a finiteness probe),
2. loss at the GROUND-TRUTH parameters (density 0.01, k_bend 2.0-stretch?
   — reference OptimizationTaskSetup.cpp:213-220) as the yardstick,
3. loss landscape slices along each parameter across the linesearch
   ladder's scales (f32 quantization check).

Usage: python tools/dress_diag.py [--fd-delta-rel 3e-3]
Writes output/dress_diag_r5.json.
"""
import argparse, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fd-delta-rel", type=float, default=3e-3)
    args = ap.parse_args()
    import jax.numpy as jnp
    from diffcloth_tpu.optim.helper import OptimizeHelper
    from diffcloth_tpu.optim.solver import default_guess_vec
    from diffcloth_tpu.tasks.setup import build_task

    t0 = time.time()
    task = build_task("dress", dtype=jnp.float32)
    helper = OptimizeHelper(task.sim, task.mask, task.loss_fn(),
                            param_base=task.param_base)
    print(f"task built in {time.time()-t0:.0f}s; slots:",
          [s.name for s in helper._slots], flush=True)
    x0 = default_guess_vec(task, helper)
    print("x0:", x0, flush=True)

    out = {"x0": x0.tolist(),
           "slots": [s.name for s in helper._slots]}

    # ground-truth yardstick
    x_gt = helper.params_to_vec(task.param_gt)
    L_gt = helper.loss(x_gt)
    print(f"loss at GT params {x_gt}: {L_gt:.6f}", flush=True)
    out["x_gt"] = x_gt.tolist()
    out["loss_at_gt"] = float(L_gt)

    # adjoint gradient at the guess
    L0, g0 = helper.loss_and_grad(x0)
    print(f"loss at guess: {L0:.6f}  grad: {g0}", flush=True)
    out["loss_at_guess"] = float(L0)
    out["grad_at_guess"] = g0.tolist()

    # central differences per slot, relative deltas
    fd = []
    for i in range(helper.n_params):
        d = args.fd_delta_rel * max(abs(x0[i]), 1e-3)
        xp = x0.copy(); xp[i] += d
        xm = x0.copy(); xm[i] -= d
        Lp, Lm = helper.loss(xp), helper.loss(xm)
        fd_i = (Lp - Lm) / (2 * d)
        fd.append(fd_i)
        rel = abs(fd_i - g0[i]) / max(abs(fd_i), abs(g0[i]), 1e-12)
        print(f"slot {helper._slots[i].name}: fd {fd_i:.6g} "
              f"adjoint {g0[i]:.6g} rel-diff {rel:.3f} "
              f"(Lp {Lp:.6f} Lm {Lm:.6f} d {d:.3g})", flush=True)
    out["fd_at_guess"] = fd

    # landscape slices: does the loss move at linesearch scales?
    slices = {}
    for i in range(helper.n_params):
        name = helper._slots[i].name
        vals = []
        for scale in (1e-4, 1e-3, 1e-2, 1e-1):
            d = scale * (helper.upper_bound[i] - helper.lower_bound[i])
            xp = np.clip(x0.copy(), helper.lower_bound, helper.upper_bound)
            xp[i] = np.clip(xp[i] + d, helper.lower_bound[i],
                            helper.upper_bound[i])
            vals.append({"scale": scale, "L": float(helper.loss(xp))})
        slices[name] = vals
        print(f"slice {name}: {vals}", flush=True)
    out["slices"] = slices

    os.makedirs("output", exist_ok=True)
    with open("output/dress_diag_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("saved output/dress_diag_r5.json", flush=True)


if __name__ == "__main__":
    main()
