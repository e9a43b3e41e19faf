"""Sweep-and-prune self-collision broad phase (selfcol.py): exact parity
with the all-pairs narrow-phase oracle, window-miss detection, and
order-independent layering.

reference: broad phase = 1-D uniform grid on the longest AABB axis
(Simulation.cpp:278-356) + distance cutoff (:323); adjacency exclusion via
pointpointConnectionTable (:319).
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffcloth_tpu.core import selfcol as sc


def random_config(seed, n=200, n_adj=300):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, 3) * 0.5)
    v = jnp.asarray(rng.randn(n, 3) * 0.3)
    radii = jnp.asarray(np.abs(rng.rand(n)) * 0.05 + 0.02)
    conn = np.zeros((n, n), bool)
    for _ in range(n_adj):
        a, b = rng.randint(0, n, 2)
        conn[a, b] = conn[b, a] = True
    np.fill_diagonal(conn, False)
    return x, v, radii, conn


def pairset(cs):
    m = np.asarray(cs.mask)
    pi, pj = np.asarray(cs.pair_i)[m], np.asarray(cs.pair_j)[m]
    return set(map(tuple, np.sort(np.stack([pi, pj], 1), axis=1)))


def test_sweep_matches_allpairs_oracle():
    h = 0.02
    for seed in range(4):
        x, v, radii, conn = random_config(seed)
        n = x.shape[0]
        cand = jnp.asarray(sc.build_candidate_pairs(conn), jnp.int32)
        cs_ref = sc.detect_self_collisions(cand, radii, x, v, h,
                                           cap_pairs=512)
        allowed = jnp.asarray(~conn & ~np.eye(n, dtype=bool))
        cs_sw = sc.detect_self_collisions_sweep(allowed, radii, x, v, h,
                                                window=64, cap_pairs=512)
        assert pairset(cs_ref) == pairset(cs_sw)
        assert not bool(cs_ref.overflow) and not bool(cs_sw.overflow)


def test_sweep_window_miss_flags_overflow():
    x, v, radii, conn = random_config(0)
    n = x.shape[0]
    allowed = jnp.asarray(~conn & ~np.eye(n, dtype=bool))
    full = sc.detect_self_collisions_sweep(allowed, radii, x, v, 0.02,
                                           window=64, cap_pairs=512)
    tiny = sc.detect_self_collisions_sweep(allowed, radii, x, v, 0.02,
                                           window=4, cap_pairs=512)
    # the tiny window misses pairs -> it MUST raise the overflow flag
    assert pairset(tiny) != pairset(full)
    assert bool(tiny.overflow)


def test_layering_is_candidate_order_independent():
    """Layer assignment uses canonical pair ids, so shuffling the candidate
    slots must produce identical (pair -> layer) maps."""
    x, v, radii, conn = random_config(1, n=100, n_adj=50)
    n = x.shape[0]
    cand = sc.build_candidate_pairs(conn)
    rng = np.random.RandomState(7)
    cand_shuf = cand[rng.permutation(len(cand))]
    a = sc.detect_self_collisions(jnp.asarray(cand, jnp.int32), radii, x, v,
                                  0.05, cap_pairs=1024)
    b = sc.detect_self_collisions(jnp.asarray(cand_shuf, jnp.int32), radii,
                                  x, v, 0.05, cap_pairs=1024)
    a = sc.assign_layers(a, n, max_layers=16)
    b = sc.assign_layers(b, n, max_layers=16)

    def layer_map(cs):
        m = np.asarray(cs.mask)
        return {(int(i), int(j)): int(l) for i, j, l in zip(
            np.asarray(cs.pair_i)[m], np.asarray(cs.pair_j)[m],
            np.asarray(cs.layer)[m])}

    la, lb = layer_map(a), layer_map(b)
    assert la and la == lb


def test_sweep_inside_jit_vmap():
    """The production call site is inside a vmapped jitted scan; make sure
    batching the sweep works and stays finite."""
    x, v, radii, conn = random_config(2, n=64, n_adj=40)
    n = x.shape[0]
    allowed = jnp.asarray(~conn & ~np.eye(n, dtype=bool))

    @jax.jit
    @jax.vmap
    def detect(xb, vb):
        cs = sc.detect_self_collisions_sweep(allowed, radii, xb, vb, 0.02,
                                             window=32, cap_pairs=64)
        return cs.mask.sum(), cs.overflow

    xs = jnp.stack([x, x + 0.01, x * 0.5])
    vs = jnp.stack([v, v, v])
    counts, ovf = detect(xs, vs)
    assert counts.shape == (3,)
    assert not bool(jnp.any(ovf))
