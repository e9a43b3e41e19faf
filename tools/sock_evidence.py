"""Sock-task quality evidence (VERDICT r3 #4): is the sock actually worn?

Round 3's optimization reached hard-max keypoint loss 1.108
(output/sock-r3/optimization.json) but nothing showed what a KNOWN-GOOD
trajectory achieves or what the optimized rollout looks like.  This commits:

  (a) a rendered GIF of the optimized trajectory (leg capsules overlaid),
  (b) per-keypoint final worst/best candidate distances,
  (c) the hard-max loss of a hand-scripted known-good insertion trajectory
      (the "achievable" oracle): the four attachment points carry the sock
      opening from its start pose to just below the toe, over the foot, and
      up the (tilted) leg axis to the leg-top ring — the motion the
      reference's CORNERS_2_WEARSOCK spline is parameterized to discover
      (Simulation.cpp:2024-2053; keypoint anatomy
      OptimizationTaskSetup.cpp:75-124).

Usage: python tools/sock_evidence.py [--out output/sock_evidence]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def keypoint_report(xs, info):
    """Per-keypoint worst/best candidate distance at its target frame."""
    frames = np.asarray(info.keypoint_frames)
    targets = np.asarray(info.keypoint_targets)
    cands = np.asarray(info.keypoint_candidates)
    rows = []
    for k in range(frames.shape[0]):
        x = xs[frames[k] - 1]
        cc = cands[k][cands[k] >= 0]
        d = np.linalg.norm(x[cc] - targets[k][None, :], axis=-1)
        rows.append({"k": k, "frame": int(frames[k]),
                     "worst_d": round(float(d.max()), 4),
                     "best_d": round(float(d.min()), 4),
                     "worst_cand": int(cc[int(d.argmax())])})
    return rows


def capsule_points(center, rot, length, radius, n_ring=10, n_seg=8):
    """Sampled capsule surface points for the render overlay."""
    ts = np.linspace(0.0, length, n_seg)
    angs = np.linspace(0, 2 * np.pi, n_ring, endpoint=False)
    pts = []
    for t in ts:
        for a in angs:
            local = np.array([radius * np.cos(a), t, radius * np.sin(a)])
            pts.append(center + rot @ local)
    return np.stack(pts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/sock_evidence")
    ap.add_argument("--opt-json", default="output/sock-r3/optimization.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffcloth_tpu.io import viewer
    from diffcloth_tpu.optim.helper import OptimizeHelper
    from diffcloth_tpu.tasks.setup import build_task, lower_leg_entries

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    task = build_task("sock", dtype=jnp.float32)
    sim = task.sim
    helper = OptimizeHelper(sim, task.mask, task.loss_fn(),
                            param_base=task.param_base)
    print(f"task built in {time.time() - t0:.0f}s n={sim.n} "
          f"steps={sim.n_steps}", flush=True)

    # leg geometry (same parameters the task setup uses)
    cfg = sim.cfg
    prims_host = np.asarray(sim.prims.center)
    center = np.asarray(prims_host[1], np.float64)      # foot capsule base
    entries, geo = lower_leg_entries(
        center, np.asarray(cfg.sock_leg_orientation))
    r = geo["radius"]
    knee = geo["knee"]
    leg_len, foot_len = 5.0, 4.0
    axis_foot = np.asarray(cfg.sock_leg_orientation, np.float64)
    axis_foot /= np.linalg.norm(axis_foot)
    leg_dir = geo["rot_leg"] @ np.array([0.0, 1.0, 0.0])
    overlay = np.concatenate([
        capsule_points(center, geo["rot_foot"], foot_len, r),
        capsule_points(center + knee, geo["rot_leg"], leg_len, r)])

    results = {}

    def evaluate(name, xfs, spline_note):
        p_inv = sim.p_inv(task.param_base)
        X, V, stats, _ = sim._chunk_forward(task.param_base, p_inv, xfs, 50)
        recs = sim._records_from_chunks(task.param_base, xfs, X, V, stats)
        L = float(task.loss_fn()(recs))
        xs = np.asarray(recs.steps.x)
        conv = np.asarray(recs.steps.converged)
        rows = keypoint_report(xs, task.loss_info)
        print(f"== {name}: hard loss {L:.6f} converged "
              f"{conv.sum()}/{conv.size}", flush=True)
        for row in rows:
            print("  ", json.dumps(row), flush=True)
        gif = viewer.render_episode(
            xs, sim.scene_host.tris, os.path.join(args.out, f"{name}.gif"),
            stride=16, overlay_pts=overlay)
        print("wrote", gif, flush=True)
        results[name] = {"hard_loss": L, "converged": int(conv.sum()),
                         "keypoints": rows, "note": spline_note,
                         "gif": gif}

    # (a)+(b): the round-3 optimized trajectory
    with open(args.opt_json) as fh:
        opt = json.load(fh)
    x_opt = np.asarray(opt["x_final"], np.float64)
    params_opt = helper.vec_to_params(x_opt)
    evaluate("optimized", sim.x_fixed_seq(params_opt),
             f"spline params from {args.opt_json} "
             f"(final_loss {opt['final_loss']:.4f})")

    # (c): hand-scripted known-good insertion — rigid translation of the
    # attachment set along scripted waypoints.  Several pull depths and
    # entry timings are evaluated (scripted dressing is exactly the hard
    # part the optimizer automates); the best becomes the oracle.
    xf0 = np.asarray(sim.stage_dev.fixed_pos_rest, np.float64)   # (F,3)
    c0 = xf0.mean(axis=0)
    toe = center - (r + 0.6) * axis_foot         # below the toe cap
    N = sim.n_steps
    offsets = xf0 - c0

    def script(waypoints):
        cs = np.zeros((N, 3))
        for i in range(N):
            t = (i + 1) / N
            for (t0w, p0), (t1w, p1) in zip(waypoints[:-1], waypoints[1:]):
                if t0w <= t <= t1w:
                    a = (t - t0w) / max(t1w - t0w, 1e-9)
                    cs[i] = (1 - a) * p0 + a * p1
                    break
        return jnp.asarray(cs[:, None, :] + offsets[None, :, :], sim.dtype)

    knee_c = center + knee
    variants = {}
    for name, frac_up, entry in (
            ("pull_mid", 0.5, 0.62), ("pull_mid_slow", 0.5, 0.75),
            ("pull_high", 1.0, 0.62), ("pull_low", 0.25, 0.62),
            ("pull_knee", 0.0, 0.62)):
        end = knee_c + frac_up * leg_len * leg_dir
        variants[name] = [(0.0, c0), (0.30, toe), (entry, toe),
                          (1.0, end)]

    p_inv = sim.p_inv(task.param_base)
    scores = {}
    for name, wps in variants.items():
        xfs = script(wps)
        X, V, stats, _ = sim._chunk_forward(task.param_base, p_inv, xfs, 50)
        recs = sim._records_from_chunks(task.param_base, xfs, X, V, stats)
        scores[name] = float(task.loss_fn()(recs))
        print(f"oracle variant {name}: hard loss {scores[name]:.4f}",
              flush=True)
    best = min(scores, key=scores.get)
    results["oracle_variants"] = {k: round(v, 4) for k, v in scores.items()}
    evaluate("oracle", script(variants[best]),
             f"best hand-scripted insertion '{best}' of {list(scores)} — "
             "start -> below toe (entry dwell) -> up the leg axis")

    results["summary"] = {
        "optimized_hard_loss": results["optimized"]["hard_loss"],
        "oracle_hard_loss": results["oracle"]["hard_loss"],
        "capsule_radius": r,
    }
    with open(os.path.join(args.out, "evidence.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print("RESULTS", json.dumps(results["summary"]), flush=True)


if __name__ == "__main__":
    main()
