"""Matched-convergence reference row: tshirt wind scene, f64, eps=1e-8 —
the reference's own tolerance (OptimizationTaskConfigurations.cpp:280) on the
reference's own hardware class (CPU).  Run as a subprocess by bench.py (the
axon sitecustomize pins JAX_PLATFORMS, so CPU must be forced in-process).

Prints one JSON line (last line):
  {"steps_per_sec": ..., "mean_iters": ..., "converged_frac": ...,
   "traj_npz": path}
and saves the (N, n, 3) trajectory for the f32-vs-f64 error row.
"""
import json
import sys
import time

import numpy as np

CHUNK = 25


def main():
    out_npz = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_f64_traj.npz"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import __graft_entry__ as entrymod

    sim = entrymod._flagship_sim(dtype=jnp.float64)
    assert sim.eps_forward <= 1e-8, sim.eps_forward
    params = sim.default_params()._replace(
        wind=jnp.array([0.04, 0.004, 0.04], jnp.float64),
        wind_freq=jnp.asarray(10.0, jnp.float64),
        wind_phase=jnp.asarray(0.5, jnp.float64))
    p_inv = sim.p_inv(params)
    xfs = sim.x_fixed_seq(params)
    idx_f = jnp.arange(1, sim.n_steps + 1, dtype=jnp.float64)

    def chunk(x, v, xf_c, idx_c):
        def body(c, inp):
            x, v = c
            xf, i = inp
            x2, v2, aux = sim.step(x, v, params, xf, p_inv, i * sim.h, i)
            return (x2, v2), (x2, aux.converged, aux.iters)
        return jax.lax.scan(body, (x, v), (xf_c, idx_c))

    f = jax.jit(chunk)
    x, v = params.x0, params.v0
    t_compile = time.time()
    f(x, v, xfs[:CHUNK], idx_f[:CHUNK])[0][0].block_until_ready()
    print(f"# compile {time.time() - t_compile:.0f}s", file=sys.stderr,
          flush=True)

    X, conv, iters = [], [], []
    t0 = time.time()
    for c0 in range(0, sim.n_steps, CHUNK):
        (x, v), (Xc, cc, ic) = f(x, v, xfs[c0:c0 + CHUNK],
                                 idx_f[c0:c0 + CHUNK])
        X.append(np.asarray(Xc))
        conv.append(np.asarray(cc))
        iters.append(np.asarray(ic))
        print(f"# steps {c0 + CHUNK}/{sim.n_steps} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
    elapsed = time.time() - t0

    X = np.concatenate(X)
    conv = np.concatenate(conv)
    iters = np.concatenate(iters)
    np.savez_compressed(out_npz, x=X)
    print(json.dumps({
        "steps_per_sec": round(sim.n_steps / elapsed, 2),
        "mean_iters": round(float(iters.mean()), 1),
        "converged_frac": round(float(conv.mean()), 4),
        "eps": sim.eps_forward,
        "traj_npz": out_npz,
    }))


if __name__ == "__main__":
    main()
