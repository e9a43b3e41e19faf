"""Closed-loop NN hat-dressing controller — JAX/optax-native.

reference: src/python_code/hatController.py (app), clothNN/controller.py
(tanh-MLP with orthogonal init), common.py:61-78 (rollout with action-delta
clamp in [-0.1, 0.1]).

TPU-first redesign: instead of a per-step torch<->C++ crossing, the whole
closed-loop rollout (controller + simulator step) is one `lax.scan` inside
jit — the policy gradient flows through the implicit-adjoint step VJPs, and
training batches vmap over sampled initial poses.  The torch bridge
(api/torch_bridge.py) remains available for the reference's original
workflow.

Usage: python apps/hat_controller.py [--epochs N] [--train-samples K]
       [--eval] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--train-samples", type=int, default=8)
    ap.add_argument("--steps", type=int, default=None,
                    help="override horizon (default: scene's 400)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=2e-4)  # hatController.py:233
    ap.add_argument("--lr-decay", default="cosine",
                    choices=["cosine", "none"],
                    help="cosine-decay the LR to 10%% over the run "
                         "(round-3 training swung 0.41->4.99 late at "
                         "constant LR)")
    ap.add_argument("--action-grad-clamp", type=float, default=4.0,
                    help="per-step norm clamp on the action cotangent "
                         "(reference SimFunction.backward dL/da clamp, "
                         "pySim/functional.py:89-99); 0 disables")
    ap.add_argument("--sample-gnorm-max", type=float, default=1e3,
                    help="drop a sampled pose's policy gradient when its "
                         "norm exceeds this (contact-stiff outlier "
                         "rejection); 0 disables")
    ap.add_argument("--val-samples", type=int, default=4,
                    help="fixed held-out pose set evaluated every epoch; "
                         "the shipped controller is best-VAL (reference "
                         "tracks best train/val, hatController.py:156-185)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in --out "
                         "(reference --train_resume --load_epoch, "
                         "hatController.py:249-250)")
    ap.add_argument("--out", default="output/hat_controller")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from diffcloth_tpu.tasks.setup import build_task

    task = build_task("hat", dtype=jnp.float32)
    sim = task.sim
    if args.steps is not None:
        sim.n_steps = args.steps
    n_steps = args.steps or sim.n_steps
    params_sim = task.param_base
    p_inv = sim.p_inv(params_sim)
    dtype = sim.dtype

    head_center = jnp.asarray(sim.prims.center[0], dtype)
    head_radius = float(sim.prims.radius[0])
    attach_idx = np.asarray(sim.stage_host.particle_idx)
    ndof_u = 3 * len(attach_idx)
    x0 = params_sim.x0
    clip0 = sim.stage_dev.fixed_pos_rest.astype(dtype)        # (F,3)
    target = jnp.asarray(task.loss_info.x_init, dtype) + \
        jnp.asarray(task.loss_info.target_translation, dtype)  # (n,3)
    # CLIP_DIR_VERTEX_PAIR (hatController.py:211)
    dir_pairs = np.array([[394, 562], [32, 108]])
    clip_rest_dist = float(jnp.linalg.norm(clip0[1] - clip0[0]))

    # ----------------------------------------------------------- featurize
    # reference getState (hatController.py:137-154): [x - target,
    # head-projection of cloth mean, elevation vector, mean velocity,
    # clip direction vectors]

    def featurize(x, v):
        x_mean = jnp.mean(x, axis=0)
        v_mean = jnp.mean(v, axis=0)
        elev = head_radius * (x_mean - head_center) / jnp.maximum(
            jnp.linalg.norm(x_mean - head_center), 1e-9)
        proj = elev + head_center
        dirs = (x[dir_pairs[:, 0]] - x[dir_pairs[:, 1]]).reshape(-1)
        return jnp.concatenate([(x - target).reshape(-1), proj, elev,
                                v_mean, dirs])

    feat_dim = int(featurize(x0, jnp.zeros_like(x0)).shape[0])
    widths = [feat_dim, 64, 64, ndof_u]   # hatController.py:232

    # tanh MLP, orthogonal init, tiny last layer (clothNN/controller.py)
    def init_net(key):
        ws = []
        for i in range(len(widths) - 1):
            key, k = jax.random.split(key)
            gain = 5.0 / 3.0 if i < len(widths) - 2 else (5.0 / 3.0) * 0.001
            w = jax.nn.initializers.orthogonal(gain)(
                k, (widths[i], widths[i + 1]), dtype)
            ws.append({"w": w, "b": jnp.zeros((widths[i + 1],), dtype)})
        return ws

    def net(ws, s):
        h = s
        for i, layer in enumerate(ws):
            h = h @ layer["w"] + layer["b"]
            if i < len(ws) - 1:
                h = jnp.tanh(h)
        return h

    # ------------------------------------------------------------- rollout
    V_MIN, V_MAX = -0.1, 0.1   # action-delta clamp (common.py:63)
    CHUNK = 50                 # steps per device call (see below)

    # Per-step action-cotangent clamp — the torch bridge's dL/da norm
    # clamp (functional.py:89-99; flags.action_grad_max_norm).  Without it
    # a single contact-stiff step's adjoint can inject a 1e6-norm spike
    # into the 400-step policy-gradient chain (the r4 gnorm blowups in
    # epochs 140+, output/hat_train_r4b.log).
    def _make_cot_clamp(max_norm):
        @jax.custom_vjp
        def f(a):
            return a

        def fwd(a):
            return a, None

        def bwd(_, g):
            nrm = jnp.linalg.norm(g)
            scale = jnp.where(nrm > max_norm,
                              max_norm / jnp.maximum(nrm, 1e-30), 1.0)
            return (g * scale,)

        f.defvjp(fwd, bwd)
        return f

    clamp_a = (_make_cot_clamp(args.action_grad_clamp)
               if args.action_grad_clamp > 0 else (lambda a: a))

    def chunk_roll(ws, x, v, a, idxs_c):
        """`CHUNK` closed-loop steps (controller + simulator) in one scan.

        The whole 400-step rollout+gradient in ONE fused executable is
        exactly the long-execution shape that crashes remote-TPU workers
        (round-2 training needed an out-of-tree retry loop to reach epoch
        32); the episode is therefore split into short chunks with state
        carried on device and the adjoint chained host-side — the same
        scheme as ClothSim.episode_value_and_grad_chunked, with the policy
        parameters as an extra differentiated input of every chunk."""
        def body(carry, idx_f):
            x, v, a = carry
            s = featurize(x, v)
            out = jnp.clip(net(ws, s), -1.0, 1.0)
            delta = (out + 1.0) / 2.0 * (V_MAX - V_MIN) + V_MIN
            a = a + delta.reshape(-1, 3)
            x2, v2, aux = sim.step(x, v, params_sim, clamp_a(a), p_inv,
                                   idx_f * sim.h, idx_f)
            return (x2, v2, a), x2[attach_idx]

        (xN, vN, aN), clip_traj = jax.lax.scan(body, (x, v, a), idxs_c)
        return xN, vN, aN, clip_traj

    fwd_jit = jax.jit(jax.vmap(chunk_roll, in_axes=(None, 0, 0, 0, None)))

    def vjp_chunk(ws, x, v, a, idxs_c, cot):
        _, vjp = jax.vjp(
            lambda w_, x_, v_, a_: chunk_roll(w_, x_, v_, a_, idxs_c),
            ws, x, v, a)
        return vjp(cot)

    bwd_jit = jax.jit(jax.vmap(vjp_chunk, in_axes=(None, 0, 0, 0, None, 0)))

    # composite loss (hatController.py:54-76): stretch + direction +
    # smooth-L1 target
    def smooth_l1(a, b):
        d = a - b
        ad = jnp.abs(d)
        return jnp.mean(jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5))

    def traj_loss(clip_traj, xN):
        """Loss over the stacked clip trajectory + final state (the only
        record slices the composite loss reads)."""
        clip_dist = jnp.linalg.norm(clip_traj[:, 1] - clip_traj[:, 0],
                                    axis=-1)
        stretch = jnp.sum(
            jnp.clip(jnp.abs(clip_dist - clip_rest_dist) - 1.0, 0.0)) * 0.2
        dirs = xN[dir_pairs[:, 0]] - xN[dir_pairs[:, 1]]
        goal_dirs = target[dir_pairs[:, 0]] - target[dir_pairs[:, 1]]
        cos = jnp.sum(
            dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True) *
            goal_dirs / jnp.linalg.norm(goal_dirs, axis=-1, keepdims=True),
            axis=-1)
        direction = jnp.sum((0.5 - jnp.clip(cos, None, 0.5)) * 3.0)
        target_l = smooth_l1(xN.reshape(-1), target.reshape(-1))
        return stretch + direction + target_l

    loss_cots = jax.jit(jax.value_and_grad(
        lambda clip_traj, xN: jnp.mean(
            jax.vmap(traj_loss)(clip_traj, xN)), argnums=(0, 1)))

    # largest chunk <= CHUNK dividing the horizon (one compiled shape/pass)
    chunk = next(c for c in range(min(CHUNK, n_steps), 0, -1)
                 if n_steps % c == 0)
    n_chunks = n_steps // chunk

    def loss_and_grad(ws, xs, aas):
        """Mean episode loss over the pose batch + dL/dws, all passes in
        bounded CHUNK-step device calls."""
        idx_f = jnp.arange(1, n_steps + 1, dtype=dtype)
        x, v, a = xs, jnp.zeros_like(xs), aas
        ins, clips = [], []
        for c in range(n_chunks):
            sl = slice(c * chunk, (c + 1) * chunk)
            ins.append((x, v, a))
            x, v, a, clip_c = fwd_jit(ws, x, v, a, idx_f[sl])
            jax.block_until_ready(x)
            clips.append(clip_c)
        clip_traj = jnp.concatenate(clips, axis=1)     # (B, N, F, 3)

        L, (dclip, dxN) = loss_cots(clip_traj, x)

        cot_x, cot_v, cot_a = dxN, jnp.zeros_like(v), jnp.zeros_like(a)
        gws_ps = None      # PER-SAMPLE policy grads (B leading axis)
        for c in reversed(range(n_chunks)):
            sl = slice(c * chunk, (c + 1) * chunk)
            x_in, v_in, a_in = ins[c]
            gw_c, gx, gv, ga = bwd_jit(ws, x_in, v_in, a_in, idx_f[sl],
                                       (cot_x, cot_v, cot_a, dclip[:, sl]))
            jax.block_until_ready(gx)
            cot_x, cot_v, cot_a = gx, gv, ga
            gws_ps = gw_c if gws_ps is None else jax.tree.map(
                jnp.add, gws_ps, gw_c)
        # per-sample gradient norms: instrument AND reject contact-stiff
        # outliers (VERDICT r4: clamping the global norm masked, not
        # fixed, the 1e6-gnorm spikes)
        sq = sum(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1)
                 for g in jax.tree.leaves(gws_ps))
        gn_ps = jnp.sqrt(sq)                          # (B,)
        if args.sample_gnorm_max > 0:
            keep = gn_ps <= args.sample_gnorm_max
            keep = jnp.where(jnp.any(keep), keep,
                             jnp.ones_like(keep))     # never drop all
        else:
            keep = jnp.ones_like(gn_ps, bool)
        # loss cotangents already carry 1/B of the mean; dropped samples
        # zero out (bounded bias instead of an unbounded spike)
        gws = jax.tree.map(
            lambda g: jnp.sum(jnp.where(
                keep.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0),
                axis=0), gws_ps)
        return L, gws, np.asarray(gn_ps), np.asarray(~keep)

    # initial-pose sampling on a sphere around the head
    # (hatController.py:18-28)
    cloth_center = np.asarray(x0).mean(axis=0)
    head_np = np.asarray(head_center)
    diff = head_np - cloth_center
    dist = float(np.linalg.norm([diff[0], diff[2]])) + 3.0

    def sample_pose(rng):
        xz = rng.uniform(0, 2 * math.pi)
        y = math.radians(rng.uniform(0, 90))
        point = np.array([dist * math.cos(y) * math.cos(xz),
                          0.0,
                          dist * math.cos(y) * math.sin(xz)])
        point[1] = dist * math.sin(y)
        center = head_np.copy()
        center[1] = cloth_center[1]
        translation = (point + center) - cloth_center
        return (jnp.asarray(np.asarray(x0) + translation, dtype),
                jnp.asarray(np.asarray(clip0) + translation, dtype))

    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    ws = init_net(key)
    if args.lr_decay == "cosine":
        lr_sched = optax.cosine_decay_schedule(
            args.lr, decay_steps=max(args.epochs, 1), alpha=0.1)
    else:
        lr_sched = args.lr
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adam(lr_sched))
    opt_state = opt.init(ws)

    # fixed validation poses (held-out rng stream) + forward-only loss
    rng_val = np.random.RandomState(args.seed + 10007)
    val_poses = [sample_pose(rng_val) for _ in range(args.val_samples)]
    xs_val = jnp.stack([p[0] for p in val_poses])
    aas_val = jnp.stack([p[1] for p in val_poses])

    def val_loss(ws):
        idx_f = jnp.arange(1, n_steps + 1, dtype=dtype)
        x, v, a = xs_val, jnp.zeros_like(xs_val), aas_val
        clips = []
        for c in range(n_chunks):
            sl = slice(c * chunk, (c + 1) * chunk)
            x, v, a, clip_c = fwd_jit(ws, x, v, a, idx_f[sl])
            jax.block_until_ready(x)
            clips.append(clip_c)
        clip_traj = jnp.concatenate(clips, axis=1)
        return float(jnp.mean(jax.vmap(traj_loss)(clip_traj, x)))

    from diffcloth_tpu.utils import checkpoint as ckpt
    os.makedirs(args.out, exist_ok=True)
    ckpt_dir = os.path.join(args.out, "ckpts")

    if args.eval:
        # evaluation rollout of the trained controller (reference eval mode,
        # hatController.py:253-273): one sampled pose, chunked closed-loop
        # forward with recorded states, rendered to a GIF
        def chunk_states(ws, x, v, a, idxs_c):
            def body(carry, idx_f):
                xx, vv, aa = carry
                s = featurize(xx, vv)
                out = jnp.clip(net(ws, s), -1.0, 1.0)
                delta = (out + 1.0) / 2.0 * (V_MAX - V_MIN) + V_MIN
                aa = aa + delta.reshape(-1, 3)
                x2, v2, _ = sim.step(xx, vv, params_sim, aa, p_inv,
                                     idx_f * sim.h, idx_f)
                return (x2, v2, aa), x2
            (xN, vN, aN), X = jax.lax.scan(body, (x, v, a), idxs_c)
            return xN, vN, aN, X

        eval_jit = jax.jit(chunk_states)
        with open(os.path.join(args.out, "controller.pkl"), "rb") as fh:
            ws = jax.tree.map(lambda a: jnp.asarray(a, dtype),
                              pickle.load(fh))
        rng_eval = np.random.RandomState(args.seed + 1)
        x, a = sample_pose(rng_eval)
        v = jnp.zeros_like(x)
        idx_f = jnp.arange(1, n_steps + 1, dtype=dtype)
        frames = [np.asarray(x)]
        for c in range(n_chunks):
            sl = slice(c * chunk, (c + 1) * chunk)
            x, v, a, Xc = eval_jit(ws, x, v, a, idx_f[sl])
            jax.block_until_ready(x)
            frames.extend(np.asarray(Xc))
        xs_arr = np.stack(frames)                            # (N+1, n, 3)
        clip_traj = xs_arr[1:, attach_idx]
        L = float(traj_loss(jnp.asarray(clip_traj, dtype),
                            jnp.asarray(xs_arr[-1], dtype)))
        print(f"eval loss {L:.5f}")
        from diffcloth_tpu.io import viewer
        gif = viewer.render_episode(xs_arr, sim.scene_host.tris,
                                    os.path.join(args.out, "eval.gif"),
                                    stride=8)
        print("wrote", gif)
        return

    log = []
    start_epoch = 0
    best = float("inf")
    if args.resume and ckpt.latest_step(ckpt_dir) is not None:
        start_epoch, state = ckpt.restore_checkpoint(
            ckpt_dir, like={"ws": ws, "opt_state": opt_state,
                            "rng": rng.get_state()[1], "best": np.zeros(())})
        ws = jax.tree.map(jnp.asarray, state["ws"])
        opt_state = jax.tree.map(
            lambda a, l: jnp.asarray(a, getattr(l, "dtype", None))
            if hasattr(l, "dtype") else a, state["opt_state"], opt_state)
        rng.set_state(("MT19937", np.asarray(state["rng"], np.uint32),
                       624, 0, 0.0))
        best = float(state["best"])
        if os.path.exists(os.path.join(args.out, "log.json")):
            with open(os.path.join(args.out, "log.json")) as fh:
                log = json.load(fh)[:start_epoch]
        print(f"resumed from epoch {start_epoch} (best {best:.5f})")

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        poses = [sample_pose(rng) for _ in range(args.train_samples)]
        xs = jnp.stack([p[0] for p in poses])
        aas = jnp.stack([p[1] for p in poses])
        loss, grads, gn_ps, dropped = loss_and_grad(ws, xs, aas)
        gnorm = float(optax.global_norm(grads))
        updates, opt_state = opt.update(grads, opt_state)
        ws = optax.apply_updates(ws, updates)
        vl = val_loss(ws)
        lr_now = float(lr_sched(epoch)) if callable(lr_sched) else lr_sched
        log.append({"epoch": epoch, "train": float(loss), "val": vl,
                    "gnorm": round(gnorm, 4), "lr": lr_now,
                    "sample_gnorms": [round(float(g), 3) for g in gn_ps],
                    "dropped": int(dropped.sum())})
        drop_note = f" dropped {int(dropped.sum())}" if dropped.any() else ""
        print(f"epoch {epoch}: train {float(loss):.5f} val {vl:.5f} "
              f"gnorm {gnorm:.3f} max-sample-gnorm {float(gn_ps.max()):.3f}"
              f" lr {lr_now:.2e}{drop_note} "
              f"({time.time() - t0:.1f}s)", flush=True)
        with open(os.path.join(args.out, "log.json"), "w") as fh:
            json.dump(log, fh)
        if vl < best:  # best-VAL controller (hatController.py:156-185)
            best = vl
            with open(os.path.join(args.out, "controller.pkl"), "wb") as fh:
                pickle.dump(jax.tree.map(np.asarray, ws), fh)
        ckpt.save_checkpoint(
            ckpt_dir, epoch + 1,
            {"ws": ws, "opt_state": opt_state, "rng": rng.get_state()[1],
             "best": np.asarray(best)},
            metadata={"loss": float(loss), "val": vl})

    print("done; best val loss", best if log else None)


if __name__ == "__main__":
    main()
