"""Which formulation of "fetch partner rows" is fastest on TPU at B=64?

The friction layer apply needs fhat[partner] for each particle (a (B,n,3)
batched row gather) — measured 3.8 ms/layer at tshirt scale, the entire
full-contact slowdown.  Candidate replacements:

  gather      — baseline x[pc] (batched row gather)
  onehot_mm   — P_l @ x with a per-call (n,n) f32 one-hot (MXU matmul)
  onehot_pre  — same matmul but the one-hot is prebuilt (cost of matmul only)
  take_lanes  — x stored (3, n), jnp.take along the lane axis
  small_gather— gather only C=256 compacted rows then expand by one-hot
                (n,C) matmul
  segment_mm  — (C,n) one-hot select of partners' rows then (n,C) expand
                (two thin MXU matmuls, no gather at all)

Usage: python tools/gather_experiment.py [--B 64] [--n 1426]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(f, *args, n_calls=30):
    import jax
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_calls):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n_calls * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--n", type=int, default=1426)
    ap.add_argument("--C", type=int, default=256)
    args = ap.parse_args()
    B, n, C = args.B, args.n, args.C

    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    # a random partial matching (like a contact layer): ~80 pairs
    partner = np.full((n,), -1, np.int32)
    perm = rng.permutation(n)[:160]
    for a, b in zip(perm[0::2], perm[1::2]):
        partner[a] = b
        partner[b] = a
    pc_np = np.maximum(partner, 0)
    pc = jnp.asarray(pc_np)
    x_b = jnp.asarray(rng.randn(B, n, 3).astype(np.float32))
    out = {"B": B, "n": n}

    def run(name, fn, *extra):
        try:
            out[f"ms_{name}"] = round(timeit(jax.jit(fn), x_b, *extra), 3)
        except Exception as e:
            out[f"ms_{name}"] = repr(e)[:120]
        print(json.dumps({name: out[f"ms_{name}"]}), flush=True)

    # baseline batched row gather
    run("gather", jax.vmap(lambda x: x[pc].sum()))

    # one-hot matmul built per call
    iota = jnp.arange(n, dtype=jnp.int32)

    def onehot_mm(x):
        P = (pc[:, None] == iota[None, :]).astype(jnp.float32)
        return jnp.matmul(P, x).sum()
    run("onehot_mm", jax.vmap(onehot_mm))

    # prebuilt one-hot (shared across batch): pure matmul cost
    P_pre = jnp.asarray((pc_np[:, None] ==
                         np.arange(n)[None, :]).astype(np.float32))
    run("onehot_pre", jax.vmap(lambda x: jnp.matmul(P_pre, x).sum()))

    # take along lanes on (3, n) layout
    def take_lanes(x):
        xt = x.T                      # (3, n)
        return jnp.take(xt, pc, axis=1).sum()
    run("take_lanes", jax.vmap(take_lanes))

    # compact C-row gather + (n,C) expand matmul
    slots = np.full((C,), 0, np.int32)
    act = np.where(partner >= 0)[0]
    slots[:len(act)] = pc_np[act]
    expand = np.zeros((n, C), np.float32)
    for s, p in enumerate(act):
        expand[p, s] = 1.0
    slots_d = jnp.asarray(slots)
    expand_d = jnp.asarray(expand)

    def small_gather(x):
        vals = x[slots_d]             # (C,3) gather
        return jnp.matmul(expand_d, vals).sum()
    run("small_gather", jax.vmap(small_gather))

    # fully matmul: select (C,n) then expand (n,C)
    select = np.zeros((C, n), np.float32)
    for s, p in enumerate(act):
        select[s, pc_np[p]] = 1.0
    select_d = jnp.asarray(select)

    def segment_mm(x):
        vals = jnp.matmul(select_d, x)     # (C,3)
        return jnp.matmul(expand_d, vals).sum()
    run("segment_mm", jax.vmap(segment_mm))

    # dynamic one-hot select+expand built from index vectors per call
    # (the production case: indices change per step, matrices cannot be
    # prebuilt on host)
    slot_rows = jnp.asarray(act.astype(np.int32))  # rows with partners

    def segment_mm_dyn(x):
        iC = jnp.arange(C, dtype=jnp.int32)
        sel = (jnp.where(iC < len(act), slots_d, -1)[:, None]
               == iota[None, :]).astype(jnp.float32)       # (C,n)
        exp = (jnp.where(iC < len(act),
                         jnp.zeros((C,), jnp.int32).at[iC].set(
                             jnp.pad(slot_rows, (0, C - len(act))), ),
                         -1)[None, :] == iota[:, None]).astype(jnp.float32)
        vals = jnp.matmul(sel, x)
        return jnp.matmul(exp, vals).sum()
    run("segment_mm_dyn", jax.vmap(segment_mm_dyn))

    print("RESULTS", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
