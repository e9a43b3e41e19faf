"""Headline benchmark: batched tshirt wind-scene rollouts on one TPU chip.

Baseline (BASELINE.md): the reference runs the tshirt demo forward at
164 ms/PD-step = 6.1 steps/s for a single rollout on CPU+OpenMP.  Here a
batch of vmapped rollouts with perturbed wind runs the same scene
(tshirt1000 mesh, 250 steps @ h=1/90); the metric is aggregate converged PD
steps/s on one chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import sys
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 6.1  # reference forwardLog.txt Record 0


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

    def final_state(wind):
        params = base._replace(wind=wind)
        xN, vN, conv, iters = sim.simulate_final(params, p_inv, xfs)
        return xN, conv, iters

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    winds = jnp.asarray(
        np.random.RandomState(0).randn(B, 3) * 0.02 +
        np.array([0.04, 0.004, 0.04]), jnp.float32)
    batched = jax.jit(jax.vmap(final_state))

    xN, conv, iters = jax.block_until_ready(batched(winds))  # compile
    t0 = time.time()
    xN, conv, iters = jax.block_until_ready(batched(winds))
    elapsed = time.time() - t0

    conv_frac = float(np.asarray(conv).mean())
    assert np.all(np.isfinite(np.asarray(xN))), "non-finite rollout"
    steps_per_sec = B * sim.n_steps / elapsed

    print(json.dumps({
        "metric": "batched_pd_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 1),
        "unit": "PD steps/s (tshirt1000, 250 steps @ 1/90, batch %d, "
                "converged frac %.3f, mean iters %.0f)" % (
                    B, conv_frac, float(np.asarray(iters).mean())),
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
