"""Headline benchmark: batched tshirt wind-scene rollouts on one TPU chip.

Baseline (BASELINE.md): the reference runs the tshirt demo forward at
164 ms/PD-step = 6.1 steps/s for a single rollout on CPU+OpenMP.  Here a
batch of vmapped rollouts with perturbed wind runs the same scene
(tshirt1000 mesh, 250 steps @ h=1/90); the metric is aggregate converged PD
steps/s on one chip.

The episode is executed in chunks of CHUNK steps per device call (state
carried on device between calls): identical math to one whole-episode scan,
but each XLA execution stays short, which keeps the remote-TPU transport
happy and costs <1% in dispatch overhead.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import sys
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 6.1  # reference forwardLog.txt Record 0
CHUNK = 25


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as entrymod

    sim = entrymod._flagship_sim()
    base = sim.default_params()._replace(
        wind=jnp.array([0.04, 0.004, 0.04], jnp.float32),
        wind_freq=jnp.asarray(10.0, jnp.float32),
        wind_phase=jnp.asarray(0.5, jnp.float32))
    p_inv = sim.p_inv(base)
    xfs = sim.x_fixed_seq(base)
    h = sim.h

    def chunk_rollout(wind, x, v, xf_chunk, idx_chunk):
        params = base._replace(wind=wind)

        def body(carry, inp):
            x, v = carry
            xf, idx_f = inp
            x2, v2, aux = sim.step(x, v, params, xf, p_inv,
                                   jnp.asarray(idx_f * h, x.dtype), idx_f)
            return (x2, v2), (aux.converged, aux.iters)

        (x, v), (conv, iters) = jax.lax.scan(body, (x, v),
                                             (xf_chunk, idx_chunk))
        return x, v, jnp.sum(conv.astype(jnp.int32)), jnp.sum(iters)

    batched_chunk = jax.jit(jax.vmap(chunk_rollout,
                                     in_axes=(0, 0, 0, None, None)))

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256  # throughput peak
    winds = jnp.asarray(
        np.random.RandomState(0).randn(B, 3) * 0.02 +
        np.array([0.04, 0.004, 0.04]), jnp.float32)

    idx_f = jnp.arange(1, sim.n_steps + 1, dtype=jnp.float32)

    def episode(winds):
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

    xN, conv, iters = episode(winds)      # compile
    t0 = time.time()
    xN, conv, iters = episode(winds)
    elapsed = time.time() - t0

    total_steps = B * sim.n_steps
    conv_frac = conv / total_steps
    assert np.all(np.isfinite(np.asarray(xN))), "non-finite rollout"
    steps_per_sec = total_steps / elapsed

    print(json.dumps({
        "metric": "batched_pd_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 1),
        "unit": "PD steps/s (tshirt1000, 250 steps @ 1/90, batch %d, "
                "converged frac %.3f, mean iters %.0f)" % (
                    B, conv_frac, iters / total_steps),
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
