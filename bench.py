"""Headline benchmark: batched tshirt wind-scene rollouts on one TPU chip.

Baseline (BASELINE.md): the reference runs the tshirt demo forward at
164 ms/PD-step = 6.1 steps/s for a single rollout on CPU+OpenMP at eps=1e-8
(f64), with self-collision detection enabled (OptimizationTaskSetup.cpp:166).
Here a batch of vmapped rollouts with perturbed wind runs the same scene
(tshirt1000 mesh, 250 steps @ h=1/90, self-collision detection enabled); the
primary metric is aggregate PD steps/s on one chip.

The episode is executed in chunks of CHUNK steps per device call (state
carried on device between calls): identical math to one whole-episode scan,
but each XLA execution stays short, which keeps the remote-TPU transport
happy and costs <1% in dispatch overhead.

Prints exactly ONE JSON line to stdout (progress goes to stderr), emitted
IMMEDIATELY after the forward measurement so the driver's parse succeeds
regardless of what happens later:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

The expensive companion measurements (backward value_and_grad throughput,
our engine at the reference's exact f64/eps=1e-8 configuration on CPU, and
the f32-vs-f64 trajectory RMSE — the matched-convergence evidence) are NOT
run by default: round-3's driver bench timed out (rc=124) because they
serialized behind the headline.  Run them standalone with

    DIFFCLOTH_BENCH_EXTRAS=1 python bench.py

which appends results to output/bench_extras.json; a later default run
splices that file into the headline's "extra.precomputed" field (labeled
with its timestamp) so the driver-captured JSON still carries them.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 6.1      # reference forwardLog.txt Record 0
BASELINE_BWD_STEPS_PER_SEC = 94.0  # reference backwardLog.txt Record 0
V5E_BF16_PEAK = 197e12
CHUNK = 25
T_START = time.time()
BUDGET = float(os.environ.get("DIFFCLOTH_BENCH_BUDGET", "1800"))
EXTRAS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "output", "bench_extras.json")


def log(msg):
    print(f"[bench +{time.time() - T_START:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def remaining():
    return BUDGET - (time.time() - T_START)


def model_flops_per_iter(sim):
    """Matmul FLOPs of one PD iteration on the dense-operator path:
    apply_A (y = A x) + apply_At (A^T d) + C v (Sk matmul) + the P^{-1}
    solve.  2*m*n*3 per (m,n)@(n,3) matmul; detection/projection
    elementwise work not counted (standard matmul-MFU convention)."""
    n = sim.n
    d = sim.dense
    rows = sum(int(A.shape[0]) for A in (d.A_s, d.A_b, d.A_a, d.A_sp))
    per_matvec = lambda m: 2 * m * n * 3
    return (2 * per_matvec(rows)        # A and A^T
            + 2 * per_matvec(n)         # Sk apply + P^{-1} solve
            )


def forward_throughput(sim, base, p_inv, xfs, B):
    import jax
    import jax.numpy as jnp

    def chunk_rollout(wind, x, v, xf_chunk, idx_chunk):
        params = base._replace(wind=wind)

        def body(carry, inp):
            x, v = carry
            xf, idx_f = inp
            x2, v2, aux = sim.step(x, v, params, xf, p_inv,
                                   jnp.asarray(idx_f * sim.h, x.dtype),
                                   idx_f)
            return (x2, v2), (aux.converged, aux.iters)

        (x, v), (conv, iters) = jax.lax.scan(body, (x, v),
                                             (xf_chunk, idx_chunk))
        return x, v, jnp.sum(conv.astype(jnp.int32)), jnp.sum(iters)

    batched_chunk = jax.jit(jax.vmap(chunk_rollout,
                                     in_axes=(0, 0, 0, None, None)))
    winds = jnp.asarray(
        np.random.RandomState(0).randn(B, 3) * 0.02 +
        np.array([0.04, 0.004, 0.04]), jnp.float32)
    idx_f = jnp.arange(1, sim.n_steps + 1, dtype=jnp.float32)

    def episode():
        x = jnp.broadcast_to(base.x0, (B,) + base.x0.shape)
        v = jnp.broadcast_to(base.v0, (B,) + base.v0.shape)
        conv_total = 0
        iters_total = 0
        for c0 in range(0, sim.n_steps, CHUNK):
            c1 = min(c0 + CHUNK, sim.n_steps)
            x, v, conv, iters = batched_chunk(
                winds, x, v, xfs[c0:c1], idx_f[c0:c1])
            conv_total += int(np.sum(np.asarray(conv)))
            iters_total += int(np.sum(np.asarray(iters)))
        return jax.block_until_ready(x), conv_total, iters_total

    xN, conv, iters = episode()      # compile
    log("forward compiled + warm episode done")
    t0 = time.time()
    xN, conv, iters = episode()
    elapsed = time.time() - t0
    assert np.all(np.isfinite(np.asarray(xN))), "non-finite rollout"
    total_steps = B * sim.n_steps
    return (total_steps / elapsed, conv / total_steps, iters / total_steps,
            iters / elapsed)


def backward_throughput(sim, base, B=64):
    """Batched chunked episode value_and_grad (loss vs a zero target): the
    distributed-L-BFGS inner loop, measured end to end (forward + adjoint
    reverse sweep), reported as episode-gradient PD steps/s."""
    import jax
    import jax.numpy as jnp

    from diffcloth_tpu import losses
    from diffcloth_tpu.config import LossType

    target = jnp.zeros((sim.n_steps + 1, sim.n, 3), jnp.float32)
    info = losses.LossInfo(target_x=target)
    loss_fn = losses.make_loss_fn(LossType.MATCH_TRAJECTORY, info)
    vg = sim.episode_value_and_grad_chunked(loss_fn, chunk=CHUNK,
                                            batched=True)
    winds = jnp.asarray(
        np.random.RandomState(1).randn(B, 3) * 0.02 +
        np.array([0.04, 0.004, 0.04]), jnp.float32)
    params_b = jax.vmap(lambda w: base._replace(wind=w))(winds)

    L, g = vg(params_b)                 # compile
    jax.block_until_ready(L)
    log("backward compiled + warm episode done")
    t0 = time.time()
    L, g = vg(params_b)
    jax.block_until_ready(L)
    elapsed = time.time() - t0
    assert np.all(np.isfinite(np.asarray(L)))
    assert np.all(np.isfinite(np.asarray(g.wind)))
    return B * sim.n_steps / elapsed


def load_extras():
    try:
        with open(EXTRAS_PATH) as f:
            return json.load(f)
    except Exception:
        return None


def run_extras(sim, base):
    """The expensive companion rows, each guarded by the wall-clock budget
    and appended to output/bench_extras.json as it lands (skip, don't
    block — VERDICT r3)."""
    extras = load_extras() or {}
    extras["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")

    def save():
        os.makedirs(os.path.dirname(EXTRAS_PATH), exist_ok=True)
        with open(EXTRAS_PATH, "w") as f:
            json.dump(extras, f, indent=1)

    if remaining() > 240:
        try:
            log("extras: backward throughput (B=64)")
            bwd = backward_throughput(sim, base)
            extras["backward_vg_steps_per_sec"] = round(bwd, 1)
            extras["backward_vs_baseline"] = round(
                bwd / BASELINE_BWD_STEPS_PER_SEC, 1)
            extras.pop("backward_error", None)
        except Exception as e:
            extras["backward_error"] = repr(e)[:200]
        save()
    else:
        log("extras: skipping backward (budget)")

    npz = "/tmp/bench_f64_traj.npz"
    if remaining() > 300:
        try:
            log("extras: f64 CPU eps=1e-8 subprocess")
            out = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), "bench_f64_cpu.py"), npz],
                capture_output=True, text=True,
                timeout=max(60, remaining() - 120))
            row = json.loads(out.stdout.strip().splitlines()[-1])
            extras["f64_cpu_eps1e8_steps_per_sec"] = row["steps_per_sec"]
            extras["f64_cpu_mean_iters"] = row["mean_iters"]
            extras["f64_cpu_converged_frac"] = row["converged_frac"]
            extras.pop("f64_row_error", None)
        except Exception as e:
            extras["f64_row_error"] = repr(e)[:200]
        save()
    else:
        log("extras: skipping f64 row (budget)")

    if os.path.exists(npz) and remaining() > 120:
        try:
            import jax
            log("extras: f32 single-rollout trajectory for RMSE")
            recs = sim.rollout_chunked(base, chunk=CHUNK)
            x32 = np.asarray(recs.steps.x, np.float64)
            x64 = np.load(npz)["x"]
            rmse = np.sqrt(np.mean((x32 - x64) ** 2, axis=(1, 2)))
            extras["f32_vs_f64_traj_rmse_step125"] = float(
                np.round(rmse[124], 6))
            extras["f32_vs_f64_traj_rmse_step250"] = float(
                np.round(rmse[-1], 6))
        except Exception as e:
            extras["rmse_error"] = repr(e)[:200]
        save()
    log(f"extras written to {EXTRAS_PATH}")


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as entrymod

    # persistent compilation cache: the batched contact program costs
    # minutes of (remote) XLA compile time; cache hits on an unchanged
    # program make repeat runs start in seconds
    try:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/tmp/diffcloth_jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        log(f"compilation cache at {cache_dir}")
    except Exception as e:
        log(f"compilation cache unavailable: {e!r}")

    want_extras = os.environ.get("DIFFCLOTH_BENCH_EXTRAS", "") == "1"
    log("building flagship sim")
    sim = entrymod._flagship_sim()
    base = sim.default_params()._replace(
        wind=jnp.array([0.04, 0.004, 0.04], jnp.float32),
        wind_freq=jnp.asarray(10.0, jnp.float32),
        wind_phase=jnp.asarray(0.5, jnp.float32))
    p_inv = sim.p_inv(base)
    xfs = sim.x_fixed_seq(base)

    # Default batch: 128 — validated on chip this round at 811.8 steps/s
    # full-contact (output/step_profile_r4.log; the round-2/3 B>=128
    # remote-compile blowups were the vmap-of-pallas batching, fixed by
    # the natively-batched custom_vmap kernels).  Override via argv.
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    log(f"forward throughput B={B} (compile ~2 min)")
    steps_per_sec, conv_frac, mean_iters, iters_per_sec = \
        forward_throughput(sim, base, p_inv, xfs, B)

    extra = {}
    # MFU from the measured iteration rate (iterations/s x FLOPs/iteration)
    try:
        fpi = model_flops_per_iter(sim)
        model_fps = fpi * iters_per_sec
        extra["model_tflops_per_sec"] = round(model_fps / 1e12, 2)
        extra["mfu_pct"] = round(100.0 * model_fps * 3 / V5E_BF16_PEAK, 1)
    except Exception as e:  # pragma: no cover
        extra["mfu_error"] = repr(e)[:200]

    pre = load_extras()
    if pre:
        # companion rows measured standalone (DIFFCLOTH_BENCH_EXTRAS=1) on
        # this machine; spliced in so the driver-captured line carries them
        extra["precomputed"] = pre

    # the ONE stdout JSON line, printed before any optional extra work
    print(json.dumps({
        "metric": "batched_pd_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 1),
        "unit": "PD steps/s (tshirt1000, 250 steps @ 1/90, batch %d, "
                "self-collision on, converged frac %.3f, mean iters %.0f)"
                % (B, conv_frac, mean_iters),
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 1),
        "extra": extra,
    }), flush=True)

    if want_extras:
        run_extras(sim, base)


if __name__ == "__main__":
    main()
