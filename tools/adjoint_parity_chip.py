"""On-chip adjoint trustworthiness discriminator.

Part A: single-rollout (B=1) tshirt episode gradient at adjoint caps
{400, 64} vs CENTRAL DIFFERENCES on the wind vector (delta sized above
the f32 loss-quantization floor).  Decides whether cap-400 f32 gradients
are FD-consistent and whether cap-64 truncation corrupts them.

Part B: raw fixed-point convergence curves: for sampled episode steps
(early/mid/late), run the adjoint fixed point manually (same math as
step_bwd) for 400 iterations recording |delta|/(n h) — shows whether the
iteration converges below eps_b = 5e-4, stalls at an f32 floor, or
diverges on contact-stiff steps.

Usage: python tools/adjoint_parity_chip.py
Writes output/adjoint_parity_r5.json.
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from diffcloth_tpu import losses
    from diffcloth_tpu.config import LossType, SimFlags
    from diffcloth_tpu.core.sim import ClothSim
    from diffcloth_tpu.geometry import builder as gb
    from diffcloth_tpu.tasks.registry import TSHIRT_SCENE

    print("backend:", jax.default_backend(), flush=True)
    scene = gb.build_scene(TSHIRT_SCENE)
    out = {}

    def build(cap):
        return ClothSim(scene, flags=SimFlags(wind_enabled=True,
                                              max_backward_iters=cap))

    sim = build(400)
    base = sim.default_params()._replace(
        wind=jnp.asarray([0.04, 0.004, 0.04], jnp.float32))
    target = jnp.zeros((sim.n_steps + 1, sim.n, 3), jnp.float32)
    lf = losses.make_loss_fn(LossType.MATCH_TRAJECTORY,
                             losses.LossInfo(target_x=target))

    # ---- Part A: FD vs caps, single rollout
    grads = {}
    for cap in (400, 64):
        s = sim if cap == 400 else build(cap)
        vg = s.episode_value_and_grad_chunked(lf, chunk=25)
        t0 = time.time()
        L, g = vg(base)
        jax.block_until_ready(L)
        print(f"cap {cap}: L={float(L):.6f} dL/dwind="
              f"{np.asarray(g.wind)} ({time.time()-t0:.0f}s)", flush=True)
        grads[cap] = np.asarray(g.wind, np.float64)
        out[f"grad_wind_cap{cap}"] = grads[cap].tolist()
        out[f"loss_cap{cap}"] = float(L)

    loss_eval = sim.episode_loss_chunked(lf, chunk=25)
    fd = []
    for i in range(3):
        d = 1e-3
        Lp = float(loss_eval(base._replace(wind=base.wind.at[i].add(d))))
        Lm = float(loss_eval(base._replace(wind=base.wind.at[i].add(-d))))
        fd.append((Lp - Lm) / (2 * d))
        print(f"fd wind[{i}]: {fd[-1]:.6f} (Lp {Lp:.6f} Lm {Lm:.6f})",
              flush=True)
    out["fd_wind"] = fd
    for cap in (400, 64):
        a, b = np.asarray(fd), grads[cap]
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)
        cos = float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b),
                                1e-30))
        print(f"cap {cap} vs FD: relerr {rel:.4f} cos {cos:.6f}",
              flush=True)
        out[f"cap{cap}_vs_fd"] = {"relerr": float(rel), "cos": cos}

    # ---- Part B: fixed-point convergence curves on sampled steps
    params = base
    p_inv = sim.p_inv(params)
    xfs = sim.x_fixed_seq(params)
    X, V, stats, _ = sim._chunk_forward(params, p_inv, xfs, 25)
    X = np.asarray(X); V = np.asarray(V)
    h = sim.h
    n = sim.n
    from diffcloth_tpu.core import step as step_mod
    residual = sim.residual

    curves = {}
    rng = np.random.RandomState(0)
    for k in (5, 60, 125, 200, 249):
        x_n = jnp.asarray(X[k - 1] if k > 1 else np.asarray(params.x0))
        v_n = jnp.asarray(V[k - 1] if k > 1 else np.asarray(params.v0))
        v_new = jnp.asarray(V[k])
        xf = xfs[k]
        t = (k + 1) * h
        idx = jnp.asarray(float(k + 1), jnp.float32)
        w = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        w = w / jnp.linalg.norm(w)

        # rebuild the frozen contact context exactly like step_fwd does:
        # easiest is to call the step's fwd internals via residual's
        # closure inputs — here both contact & selfc come from a fresh
        # detection at (x_n, v_iter0), matching pd_forward
        import diffcloth_tpu.core.contact as ct
        contact = ct.ContactSet(
            mask=jnp.zeros((n,), bool), normal=jnp.zeros((n, 3)),
            v_out=jnp.zeros((n, 3)), prim_id=jnp.zeros((n,), jnp.int32))
        from diffcloth_tpu.core import selfcol_pallas as scp
        from diffcloth_tpu.core import friction_pallas as fpk
        from diffcloth_tpu.core import selfcol as sc
        cfg = sim.self_cfg
        budgets = tuple(min(c, n) for c in sc.compact_slot_budgets(
            min(cfg.compact_layers, cfg.max_layers)))
        s_n_approx = x_n + h * v_n
        v_it0 = (s_n_approx - x_n) / h
        tables, ovf = scp.detect_tables_pallas(
            cfg.allowed, sim.scene_dev.radii, x_n, v_it0, h,
            cfg.k_partners, cfg.max_layers, with_normals=False)
        geom = fpk.build_kernel_geom(tables, sim.scene_dev.area, n,
                                     budgets, x=x_n)
        selfc = (geom, ovf)

        @jax.jit
        def curve(w, v_new, x_n, v_n, xf):
            _, vjp = jax.vjp(
                lambda vn: residual(vn, x_n, v_n, params, xf, contact,
                                    selfc, t, idx), v_new)
            lam = step_mod._solve(p_inv, w)

            def fp(c, _):
                lam, prev = c
                # K-form rhs: w + (P - dR)^T lam.  Using the full
                # residual vjp here: dK^T lam = P lam - dR^T lam
                m = params.density * sim.scene_dev.area
                Pl = m[:, None] * lam + (h * h) * sim_applyAtA(lam)
                rhs = w + Pl - vjp(lam)[0]
                lam2 = step_mod._solve(p_inv, rhs)
                delta = jnp.linalg.norm(lam2 - lam) / (n * h)
                return (lam2, lam), delta

            (lamf, _), deltas = jax.lax.scan(fp, (lam, lam), None,
                                             length=400)
            return deltas

        # AtA application borrowed from the step closure via dense ops
        from diffcloth_tpu.core import dense_ops as dnops
        dense = sim.dense

        def sim_applyAtA(u):
            return dnops.apply_S_pertype(dense.S, params.k_pertype, u)

        deltas = np.asarray(curve(w, v_new, x_n, v_n, xf))
        curves[str(k)] = {
            "delta_1": float(deltas[0]), "delta_10": float(deltas[9]),
            "delta_40": float(deltas[39]), "delta_64": float(deltas[63]),
            "delta_100": float(deltas[99]), "delta_400": float(deltas[-1]),
            "min": float(deltas.min()), "argmin": int(deltas.argmin()),
            "diverged": bool(~np.isfinite(deltas).all()
                             or deltas[-1] > 1e3 * deltas[0]),
        }
        print(f"step {k}: {curves[str(k)]}", flush=True)
    out["fp_curves"] = curves

    os.makedirs("output", exist_ok=True)
    with open("output/adjoint_parity_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("saved output/adjoint_parity_r5.json", flush=True)


if __name__ == "__main__":
    main()
