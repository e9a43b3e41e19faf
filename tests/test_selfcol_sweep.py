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


def test_matrix_matches_allpairs_oracle():
    """The MXU pairwise-distance detector must produce the identical pair
    set as the all-pairs oracle (f64: the matmul distance trick is exact to
    rounding), with k-partner overflow flagged when a row exceeds K."""
    h = 0.02
    for seed in range(4):
        x, v, radii, conn = random_config(seed)
        n = x.shape[0]
        cand = jnp.asarray(sc.build_candidate_pairs(conn), jnp.int32)
        cs_ref = sc.detect_self_collisions(cand, radii, x, v, h,
                                           cap_pairs=512)
        allowed = jnp.asarray((~conn & ~np.eye(n, dtype=bool))
                              & np.triu(np.ones((n, n), bool), 1))
        cs_m = sc.detect_self_collisions_matrix(allowed, radii, x, v, h,
                                                k_partners=8, cap_pairs=512)
        assert pairset(cs_ref) == pairset(cs_m)
        assert not bool(cs_m.overflow)

    # k_partners too small for a dense cluster -> overflow flag
    x = jnp.zeros((8, 3))
    allowed = jnp.asarray(np.triu(np.ones((8, 8), bool), 1))
    cs = sc.detect_self_collisions_matrix(allowed, jnp.full((8,), 0.2), x,
                                          jnp.zeros_like(x), h,
                                          k_partners=2, cap_pairs=64)
    assert bool(cs.overflow)


def test_pallas_kernel_matches_matrix_interpret():
    """The Pallas detection kernel (interpret mode on CPU) must produce the
    identical contact set as the XLA matrix detector, including the
    overflow signal semantics."""
    from diffcloth_tpu.core import selfcol_pallas as scp
    h = 0.02
    for seed in range(3):
        x, v, radii, conn = random_config(seed)
        n = x.shape[0]
        x = jnp.asarray(np.asarray(x, np.float32))
        v = jnp.asarray(np.asarray(v, np.float32))
        radii = jnp.asarray(np.asarray(radii, np.float32))
        allowed_triu = ((~conn & ~np.eye(n, dtype=bool))
                        & np.triu(np.ones((n, n), bool), 1))
        cs_m = sc.detect_self_collisions_matrix(
            jnp.asarray(allowed_triu), radii, x, v, h, 8, 512)
        cs_p = scp.detect_self_collisions_pallas(
            jnp.asarray(scp.pack_allowed(allowed_triu)), radii, x, v, h,
            8, 512, interpret=True)
        assert pairset(cs_m) == pairset(cs_p)
        assert bool(cs_m.overflow) == bool(cs_p.overflow)

    # k overflow propagates
    x = jnp.zeros((8, 3), jnp.float32)
    allowed = np.triu(np.ones((8, 8), bool), 1)
    cs = scp.detect_self_collisions_pallas(
        jnp.asarray(scp.pack_allowed(allowed)), jnp.full((8,), 0.2),
        x, jnp.zeros_like(x), 0.02, 2, 64, interpret=True)
    assert bool(cs.overflow)


def test_table_friction_matches_pairlist_scatter():
    """The gather-only partner-table friction (the production TPU path)
    must reproduce the pair-list scatter-add Gauss-Seidel bit-for-bit at
    f64 tolerance, including Newton's third law (sum of self-friction
    forces == 0), on layered random contact sets."""
    from diffcloth_tpu.core import contact as ct
    rng = np.random.RandomState(3)
    n = 80
    x, v, radii, conn = random_config(3, n=n, n_adj=40)
    radii = jnp.asarray(np.abs(rng.rand(n)) * 0.15 + 0.05)  # denser contacts
    cand = sc.build_candidate_pairs(conn)
    cs = sc.detect_self_collisions(jnp.asarray(cand, jnp.int32), radii, x, v,
                                   0.05, cap_pairs=1024)
    L = 16
    cs = sc.assign_layers(cs, n, max_layers=L)
    assert int(np.asarray(cs.mask).sum()) > 10

    mass = jnp.asarray(rng.rand(n) * 2.0 + 0.1)
    f = jnp.asarray(rng.randn(n, 3))
    r0 = jnp.asarray(rng.randn(n, 3) * 0.1)

    r_ref = sc.self_friction(f, cs, mass, r0, L, ct.dry_friction_force)
    tables = sc.build_layer_tables(cs, n, L)
    r_tab = sc.self_friction_tables(f, tables, mass, r0, L,
                                    ct.dry_friction_force)
    np.testing.assert_allclose(np.asarray(r_tab), np.asarray(r_ref),
                               rtol=1e-12, atol=1e-14)
    # third law: the table path's own contributions cancel exactly
    delta = np.asarray(r_tab - r0)
    np.testing.assert_allclose(delta.sum(axis=0), 0.0, atol=1e-12)

    # differentiable (fori) path agrees too
    r_tab_d = sc.self_friction_tables(f, tables, mass, r0, L,
                                      ct.dry_friction_force,
                                      differentiable=True)
    np.testing.assert_allclose(np.asarray(r_tab_d), np.asarray(r_ref),
                               rtol=1e-12, atol=1e-14)


def test_symmetric_tables_pipeline_matches_pairlist():
    """The production TPU pipeline (symmetric kernel partner table -> dense
    layering -> friction tables, zero scatters) must produce EXACTLY the
    tables the pair-list pipeline (matrix detect -> assign_layers ->
    build_layer_tables) builds: identical greedy priorities imply identical
    (pair -> layer) maps, and the per-row normal convention is shared."""
    from diffcloth_tpu.core import contact as ct
    from diffcloth_tpu.core import selfcol_pallas as scp
    h = 0.02
    L = 16
    for seed in range(3):
        x, v, radii, conn = random_config(seed)
        n = x.shape[0]
        x = jnp.asarray(np.asarray(x, np.float32))
        v = jnp.asarray(np.asarray(v, np.float32))
        radii = jnp.asarray(np.asarray(radii, np.float32))
        nonadj = ~conn & ~np.eye(n, dtype=bool)
        allowed_triu = nonadj & np.triu(np.ones((n, n), bool), 1)

        cs = sc.detect_self_collisions_matrix(
            jnp.asarray(allowed_triu), radii, x, v, h, 8, 512)
        assert not bool(cs.overflow)
        cs = sc.assign_layers(cs, n, L)
        tab_ref = sc.build_layer_tables(cs, n, L)

        tab_sym, ovf = scp.detect_tables_pallas(
            jnp.asarray(scp.pack_allowed(nonadj)), radii, x, v, h,
            k_partners=16, max_layers=L, interpret=True)
        assert not bool(ovf)
        assert int(tab_sym.n_layers) == int(tab_ref.n_layers)
        np.testing.assert_array_equal(np.asarray(tab_sym.partner),
                                      np.asarray(tab_ref.partner))
        np.testing.assert_allclose(np.asarray(tab_sym.normal),
                                   np.asarray(tab_ref.normal),
                                   rtol=1e-6, atol=1e-7)

        # friction through both tables agrees
        rng = np.random.RandomState(seed)
        mass = jnp.asarray(rng.rand(n).astype(np.float32) * 2.0 + 0.1)
        f = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        r0 = jnp.zeros((n, 3), jnp.float32)
        r_a = sc.self_friction_tables(f, tab_ref, mass, r0, L,
                                      ct.dry_friction_force)
        r_b = sc.self_friction_tables(f, tab_sym, mass, r0, L,
                                      ct.dry_friction_force)
        np.testing.assert_allclose(np.asarray(r_b), np.asarray(r_a),
                                   rtol=1e-6, atol=1e-7)


def test_symmetric_tables_overflow_and_vmap():
    """k_partners too small for the symmetric per-row degree must raise the
    overflow flag; the pipeline must work under vmap (production call is a
    vmapped jitted scan)."""
    from diffcloth_tpu.core import selfcol_pallas as scp
    n = 8
    x = jnp.zeros((n, 3), jnp.float32)   # fully collapsed cluster
    nonadj = ~np.eye(n, dtype=bool)
    _, ovf = scp.detect_tables_pallas(
        jnp.asarray(scp.pack_allowed(nonadj)), jnp.full((n,), 0.2),
        x, jnp.zeros_like(x), 0.02, k_partners=3, max_layers=8,
        interpret=True)
    assert bool(ovf)

    x0, v0, radii, conn = random_config(5, n=96, n_adj=60)
    n = 96
    xs = jnp.asarray(np.stack([np.asarray(x0) * s
                               for s in (1.0, 0.7, 1.3)]), jnp.float32)
    vs = jnp.asarray(np.stack([np.asarray(v0)] * 3), jnp.float32)
    radii = jnp.asarray(np.asarray(radii, np.float32))
    allowed = jnp.asarray(scp.pack_allowed(~conn & ~np.eye(n, dtype=bool)))

    @jax.jit
    @jax.vmap
    def det(xb, vb):
        tab, ovf = scp.detect_tables_pallas(allowed, radii, xb, vb, 0.02,
                                            16, 16, interpret=True)
        return (tab.partner >= 0).sum(), ovf

    counts, ovf = det(xs, vs)
    assert counts.shape == (3,) and not bool(jnp.any(ovf))
    # per-sample partner-entry count = 2x the matrix detector's pair count
    for b in range(3):
        cs_m = sc.detect_self_collisions_matrix(
            jnp.asarray((~conn & ~np.eye(n, dtype=bool))
                        & np.triu(np.ones((n, n), bool), 1)),
            radii, xs[b], vs[b], 0.02, 8, 256)
        assert int(counts[b]) == 2 * int(np.asarray(cs_m.mask).sum()), b


def test_compact_friction_matches_tables():
    """The MXU-matmul compact friction (production PD-loop path) must
    reproduce the gather-path table friction exactly: one-hot contractions
    are single products, so the matmuls are bitwise selections."""
    from diffcloth_tpu.core import contact as ct
    rng = np.random.RandomState(7)
    n = 120
    x, v, radii, conn = random_config(7, n=n, n_adj=60)
    radii = jnp.asarray(np.abs(rng.rand(n)) * 0.12 + 0.05)
    cand = sc.build_candidate_pairs(conn)
    cs = sc.detect_self_collisions(jnp.asarray(cand, jnp.int32), radii, x, v,
                                   0.05, cap_pairs=1024)
    L = 16
    cs = sc.assign_layers(cs, n, max_layers=L)
    tables = sc.build_layer_tables(cs, n, L)
    n_layers = int(tables.n_layers)
    assert n_layers >= 2, n_layers

    area = jnp.asarray(rng.rand(n) + 0.2)
    density = jnp.asarray(1.7)
    mass = density * area
    f = jnp.asarray(rng.randn(n, 3))
    r0 = jnp.asarray(rng.randn(n, 3) * 0.1)

    budgets = tuple(min(c, n) for c in sc.compact_slot_budgets(n_layers))
    compact = sc.build_compact_layers(tables, area, n, budgets)
    assert not bool(compact.overflow)
    r_ref = sc.self_friction_tables(f, tables, mass, r0, L,
                                    ct.dry_friction_force)
    r_cmp = sc.self_friction_compact(f, compact, density, mass, r0,
                                     ct.dry_friction_force)
    np.testing.assert_allclose(np.asarray(r_cmp), np.asarray(r_ref),
                               rtol=1e-12, atol=1e-14)

    # slot-budget overflow must be flagged
    tiny = sc.build_compact_layers(tables, area, n, (2,))
    assert bool(tiny.overflow)


def test_compact_friction_density_grad_finite_f32():
    """f32 regression: empty compact slots must not NaN dL/d(density).
    The division VJP squares the 1e-30 mass guard, which underflows f32
    (1e-60 -> 0) and yields 0/0 for empty slots — caught on the dress
    optimization (its f64 CPU counterpart cannot reproduce it)."""
    from diffcloth_tpu.core import contact as ct
    rng = np.random.RandomState(21)
    n = 64
    partner = np.full((4, n), -1, np.int32)
    partner[0, 0], partner[0, 1] = 1, 0        # a single contact pair
    normal = np.zeros((4, n, 3), np.float32)
    normal[0, 0] = [1, 0, 0]
    normal[0, 1] = [-1, 0, 0]
    tables = sc.SelfContactTables(
        partner=jnp.asarray(partner), normal=jnp.asarray(normal),
        n_layers=jnp.asarray(1, jnp.int32))
    area = jnp.asarray(rng.rand(n).astype(np.float32) + 0.2)
    compact = sc.build_compact_layers(tables, area, n, (32, 32))
    f = jnp.asarray(rng.randn(n, 3).astype(np.float32))

    def loss(density):
        mass = density * area
        r = sc.self_friction_compact(f, compact, density, mass,
                                     jnp.zeros_like(f),
                                     ct.dry_friction_force)
        return jnp.sum(r * r)

    g = jax.grad(loss)(jnp.asarray(0.3, jnp.float32))
    assert np.isfinite(float(g)), g


def test_pallas_friction_kernel_matches_compact():
    """The in-VMEM friction kernel (interpret mode on CPU) must match the
    XLA compact path — same slot semantics, same per-layer drop budgets
    (ADVICE r4 medium), same dry-friction case split — to f32 rounding, in
    VALUES and in VJPs (the backward kernel is a hand-derived transposed
    linearization), single and vmapped."""
    from diffcloth_tpu.core import contact as ct
    from diffcloth_tpu.core import friction_pallas as fp
    rng = np.random.RandomState(9)
    n = 120
    x, v, radii, conn = random_config(9, n=n, n_adj=60)
    radii = jnp.asarray((np.abs(rng.rand(n)) * 0.12 + 0.05)
                        .astype(np.float32))
    x = jnp.asarray(np.asarray(x, np.float32))
    v = jnp.asarray(np.asarray(v, np.float32))
    cand = sc.build_candidate_pairs(conn)
    cs = sc.detect_self_collisions(jnp.asarray(cand, jnp.int32), radii, x,
                                   v, 0.05, cap_pairs=1024)
    L = 16
    cs = sc.assign_layers(cs, n, max_layers=L)
    tables = sc.build_layer_tables(cs, n, L)
    n_lay = max(int(tables.n_layers), 2)

    area = jnp.asarray((rng.rand(n) + 0.2).astype(np.float32))
    density = jnp.asarray(1.7, jnp.float32)
    mass = density * area
    f = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    r0 = jnp.asarray((rng.randn(n, 3) * 0.1).astype(np.float32))

    budgets = tuple(min(c, n) for c in sc.compact_slot_budgets(n_lay))
    compact = sc.build_compact_layers(tables, area, n, budgets)
    r_ref = sc.self_friction_compact(f, compact, density, mass, r0,
                                     ct.dry_friction_force)
    geom = fp.build_kernel_geom(tables, area, n, budgets)
    assert not bool(geom.overflow)
    r_k = fp.self_friction_kernel(f, geom, density, r0, budgets,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(r_k), np.asarray(r_ref),
                               rtol=2e-5, atol=1e-6)

    # VJP parity: the transposed-linearization kernel vs XLA autodiff of
    # the compact path, for every differentiable input (f, density, r0)
    def loss_k(f_, rho_, r_):
        out = fp.self_friction_kernel(f_, geom, rho_, r_, budgets,
                                      interpret=True)
        return jnp.sum(jnp.sin(out * 1.7) * jnp.cos(out * 0.3))

    def loss_c(f_, rho_, r_):
        m = rho_ * area
        out = sc.self_friction_compact(f_, compact, rho_, m, r_,
                                       ct.dry_friction_force)
        return jnp.sum(jnp.sin(out * 1.7) * jnp.cos(out * 0.3))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(f, density, r0)
    gc = jax.grad(loss_c, argnums=(0, 1, 2))(f, density, r0)
    for name, a, b in zip(("f", "density", "r0"), gc, gk):
        a, b = np.asarray(a), np.asarray(b)
        # absolute floor: self-friction is analytically density-
        # independent (k_red ~ rho cancels d ~ 1/rho), so the density
        # gradient is pure f32 noise on both sides
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 5e-4, name

    # vmapped (the production batched call site), values + grads
    B = 3
    fs = jnp.stack([f, f * 0.5, -f])
    r0s = jnp.stack([r0, r0, jnp.zeros_like(r0)])

    def one(fb, rb):
        return fp.self_friction_kernel(fb, geom, density, rb, budgets,
                                       interpret=True)

    rk_b = jax.jit(jax.vmap(one))(fs, r0s)
    for b in range(B):
        rr = sc.self_friction_compact(fs[b], compact, density, mass,
                                      r0s[b], ct.dry_friction_force)
        np.testing.assert_allclose(np.asarray(rk_b[b]), np.asarray(rr),
                                   rtol=2e-5, atol=1e-6)

    def loss_kb(fb, rb):
        return jnp.sum(one(fb, rb) ** 2)

    def loss_cb(fb, rb):
        out = sc.self_friction_compact(fb, compact, density, mass, rb,
                                       ct.dry_friction_force)
        return jnp.sum(out ** 2)

    gkb = jax.jit(jax.vmap(jax.grad(loss_kb, argnums=(0, 1))))(fs, r0s)
    gcb = jax.vmap(jax.grad(loss_cb, argnums=(0, 1)))(fs, r0s)
    for a, b in zip(gcb, gkb):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 5e-4


def test_kernel_budget_drop_matches_compact():
    """When a layer overflows its slot budget the kernel must drop the
    SAME rows the compact/residual path drops (the r4 uniform-budget
    kernel could apply friction the residual never saw -> silently wrong
    gradients, ADVICE r4 medium)."""
    from diffcloth_tpu.core import contact as ct
    from diffcloth_tpu.core import friction_pallas as fp
    rng = np.random.RandomState(3)
    n = 120
    x, v, radii, conn = random_config(3, n=n, n_adj=60)
    radii = jnp.asarray((np.abs(rng.rand(n)) * 0.15 + 0.08)
                        .astype(np.float32))
    x = jnp.asarray(np.asarray(x, np.float32))
    v = jnp.asarray(np.asarray(v, np.float32))
    cand = sc.build_candidate_pairs(conn)
    cs = sc.detect_self_collisions(jnp.asarray(cand, jnp.int32), radii, x,
                                   v, 0.05, cap_pairs=2048)
    cs = sc.assign_layers(cs, n, max_layers=8)
    tables = sc.build_layer_tables(cs, n, 8)
    assert int(tables.n_layers) >= 2

    area = jnp.asarray((rng.rand(n) + 0.2).astype(np.float32))
    density = jnp.asarray(1.1, jnp.float32)
    mass = density * area
    f = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    r0 = jnp.zeros((n, 3), jnp.float32)

    # tiny tapered budgets that FORCE drops in every layer
    budgets = (8, 4)
    compact = sc.build_compact_layers(tables, area, n, budgets)
    geom = fp.build_kernel_geom(tables, area, n, budgets)
    assert bool(geom.overflow) == bool(compact.overflow)
    r_ref = sc.self_friction_compact(f, compact, density, mass, r0,
                                     ct.dry_friction_force)
    r_k = fp.self_friction_kernel(f, geom, density, r0, budgets,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(r_k), np.asarray(r_ref),
                               rtol=2e-5, atol=1e-6)


def test_detectors_emit_unique_pairs():
    """SelfContactSet precondition (documented on the class): active slots
    hold DISTINCT unordered pairs.  build_layer_tables scatters with
    unique_indices=True, which is undefined behavior on duplicates —
    duplicate pairs share a priority, win the same matching round, and
    collide on the same (layer, particle) address (ADVICE r3)."""
    h = 0.05
    for seed in range(3):
        x, v, radii, conn = random_config(seed, n=120, n_adj=60)
        n = 120
        cand = sc.build_candidate_pairs(conn)
        for cs in (
            sc.detect_self_collisions(jnp.asarray(cand, jnp.int32), radii,
                                      x, v, h, cap_pairs=1024),
            sc.detect_self_collisions_matrix(
                jnp.asarray((~conn & ~np.eye(n, dtype=bool))
                            & np.triu(np.ones((n, n), bool), 1)),
                radii, x, v, h, 8, 1024),
            sc.detect_self_collisions_sweep(
                jnp.asarray(~conn & ~np.eye(n, dtype=bool)), radii, x, v,
                h, window=64, cap_pairs=1024),
        ):
            m = np.asarray(cs.mask)
            pairs = np.stack([np.asarray(cs.pair_i)[m],
                              np.asarray(cs.pair_j)[m]], 1)
            assert len(pairs) == len(set(map(tuple, pairs.tolist())))


def test_pallas_kernel_vmapped_parity_and_overflow():
    """Pallas detection under vmap (the production batched-rollout call
    site, now the TPU default) must match the per-sample matrix detector
    sample by sample, and the per-sample overflow flags must bump
    independently.  (On-chip equivalent at B=32 on the tshirt mesh:
    tools/detect_experiment.py — 0 mismatched samples.)"""
    from diffcloth_tpu.core import selfcol_pallas as scp
    h = 0.02
    x0, v0, radii, conn = random_config(5, n=96, n_adj=60)
    n = 96
    x0 = jnp.asarray(np.asarray(x0, np.float32))
    v0 = jnp.asarray(np.asarray(v0, np.float32))
    radii = jnp.asarray(np.asarray(radii, np.float32))
    allowed_triu = ((~conn & ~np.eye(n, dtype=bool))
                    & np.triu(np.ones((n, n), bool), 1))
    allowed_m = jnp.asarray(allowed_triu)
    allowed_p = jnp.asarray(scp.pack_allowed(allowed_triu))

    B = 4
    rng = np.random.RandomState(11)
    # sample 3 perturbed states + one fully-collapsed state (overflow)
    xs = np.stack([np.asarray(x0) * s for s in (1.0, 0.7, 1.3)]
                  + [np.zeros((n, 3))]).astype(np.float32)
    vs = np.stack([np.asarray(v0)] * 3
                  + [np.zeros((n, 3))]).astype(np.float32)
    xs, vs = jnp.asarray(xs), jnp.asarray(vs)

    det_p = jax.jit(jax.vmap(lambda x, v: scp.detect_self_collisions_pallas(
        allowed_p, radii, x, v, h, 8, 256, interpret=True)))
    csb = det_p(xs, vs)
    for b in range(B):
        cs_b = jax.tree.map(lambda a: a[b], csb)
        cs_m = sc.detect_self_collisions_matrix(
            allowed_m, radii, xs[b], vs[b], h, 8, 256)
        if not bool(cs_m.overflow):
            assert pairset(cs_b) == pairset(cs_m), b
        assert bool(cs_b.overflow) == bool(cs_m.overflow), b
    # the collapsed sample must overflow; the healthy ones must not
    ovf = np.asarray(csb.overflow)
    assert bool(ovf[3]) and not ovf[:3].any()
