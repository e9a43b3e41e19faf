"""Self-collision: sphere–sphere detection with swept minimum distance,
fixed-capacity padded pair sets, and parallel contact layering.

reference: `isSelfCollision` (Simulation.cpp:194-219) — per particle pair
(radii = half min incident edge), minimum distance of the linear motion over
the step; broad phase = 1-D uniform grid on the longest AABB axis
(Simulation.cpp:278-356) with mesh-adjacency exclusion; `contactSorting`
(Simulation.cpp:422-624) orders contacts into *layers* so friction resolves
Gauss–Seidel style with each particle touched at most once per layer.

TPU-native redesign:

  * Detection is a dense masked all-pairs test over a precomputed candidate
    list (pairs within `cand_cutoff` at REST, minus mesh-adjacent pairs).
    Cloth self-contact only happens between particles whose rest-geodesic
    distance is moderate OR between far-apart pieces that fold onto each
    other — so candidates are all non-adjacent pairs, pruned by a cheap
    runtime distance cutoff (reference uses `dist > 1.0 -> skip`,
    Simulation.cpp:323).  The result is a FIXED-capacity set of active pairs
    (index tensor + mask), sized by `cap_pairs`; overflow is detected and
    reported so capacity can be bumped at recompile.

  * Layering replaces the sequential BFS frontier expansion with K rounds of
    parallel greedy maximal matching: in each round every still-unassigned
    pair proposes itself to both endpoints via scatter-min on pair index;
    pairs that win BOTH endpoints join the current layer.  This preserves
    the invariant that matters for the physics — each particle appears at
    most once per layer (checked by the reference in debug builds,
    Simulation.cpp:605-613) — while being data-parallel.  The reference's
    BFS ordering additionally seeds layer 0 from primitive contacts; here
    primitive contacts are always resolved before any self-contact layer
    (friction applies obstacle r first), which matches the reference's
    sequencing (calculateDryFrictionVector, Simulation.cpp:639-676).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SelfContactSet(NamedTuple):
    """Fixed-capacity active self-contact pairs for one step (frozen).

    PRECONDITION: active slots (mask=True) hold DISTINCT unordered pairs.
    All detectors guarantee this by construction (each pair is tested once);
    `build_layer_tables` relies on it for its unique-index scatters, and
    duplicated pairs would share a matching priority and collide on one
    (layer, particle) address (see test_detectors_emit_unique_pairs)."""
    pair_i: jnp.ndarray     # (C,) int32 — min index of the pair
    pair_j: jnp.ndarray     # (C,) int32 — max index
    normal: jnp.ndarray     # (C,3) from j to i (normalized x_i - x_j)
    mask: jnp.ndarray       # (C,) bool
    layer: jnp.ndarray      # (C,) int32 layer id (-1 for masked)
    overflow: jnp.ndarray   # () bool — capacity exceeded this step


def build_candidate_pairs(conn_table: np.ndarray,
                          max_pairs: int = 0) -> np.ndarray:
    """All non-mesh-adjacent unordered pairs (host-side, once per scene).
    (n,n) bool -> (P,2) int32 with i<j."""
    n = conn_table.shape[0]
    iu = np.triu_indices(n, k=1)
    keep = ~conn_table[iu]
    pairs = np.stack([iu[0][keep], iu[1][keep]], axis=1).astype(np.int32)
    return pairs


def _narrow_phase(i: jnp.ndarray, j: jnp.ndarray, valid: jnp.ndarray,
                  radii: jnp.ndarray, x: jnp.ndarray, v: jnp.ndarray,
                  h: float, cap_pairs: int) -> SelfContactSet:
    """Swept sphere–sphere test over (i, j, valid) candidate arrays,
    compacted to a fixed-capacity active set.

    reference math (Simulation.cpp:194-219): with p(t) = (x_i-x_j) +
    t (v_i-v_j), min distance over t in {0, h, t*} where t* = -2 v.p0/|v|^2
    clamped to [0, h]; collides when min dist < r_i + r_j."""
    # canonicalize (min, max) so downstream layering is independent of the
    # broad phase's candidate ordering
    i, j = jnp.minimum(i, j), jnp.maximum(i, j)
    p0 = x[i] - x[j]                       # (P,3)
    dv = v[i] - v[j]
    p1 = p0 + h * dv
    d0 = jnp.linalg.norm(p0, axis=-1)
    d1 = jnp.linalg.norm(p1, axis=-1)
    denom = jnp.maximum(jnp.sum(dv * dv, axis=-1), 1e-30)
    # NOTE: the reference uses tMid = -2 (v.p0)/|v|^2 (Simulation.cpp:207),
    # twice the true minimizer; replicated for parity.
    t_mid = -2.0 * jnp.sum(dv * p0, axis=-1) / denom
    in_seg = (t_mid >= 0.0) & (t_mid <= h)
    d_mid = jnp.linalg.norm(p0 + t_mid[:, None] * dv, axis=-1)
    dmin = jnp.minimum(d0, d1)
    dmin = jnp.where(in_seg, jnp.minimum(dmin, d_mid), dmin)
    thresh = radii[i] + radii[j]
    hit = (dmin < thresh) & valid

    # compact to fixed capacity via cumsum positions + scatter (keeps
    # candidate order like the reference's sequential scan; O(P) — a full
    # argsort over 100k+ candidates dominated the step cost at small batch)
    pos = jnp.cumsum(hit.astype(jnp.int32)) - 1
    tgt = jnp.where(hit & (pos < cap_pairs), pos, cap_pairs)  # cap -> drop
    nrm_all = p0 / jnp.maximum(
        jnp.linalg.norm(p0, axis=-1, keepdims=True), 1e-12)
    pi = jnp.zeros((cap_pairs,), jnp.int32).at[tgt].set(
        i.astype(jnp.int32), mode="drop")
    pj = jnp.zeros((cap_pairs,), jnp.int32).at[tgt].set(
        j.astype(jnp.int32), mode="drop")
    nrm = jnp.zeros((cap_pairs, 3), x.dtype).at[tgt].set(
        nrm_all, mode="drop")
    mask = jnp.zeros((cap_pairs,), bool).at[tgt].set(True, mode="drop")
    overflow = jnp.sum(hit) > cap_pairs
    return SelfContactSet(
        pair_i=pi, pair_j=pj,
        normal=nrm, mask=mask,
        layer=jnp.full((cap_pairs,), -1, jnp.int32), overflow=overflow)


def detect_self_collisions(cand: jnp.ndarray, radii: jnp.ndarray,
                           x: jnp.ndarray, v: jnp.ndarray, h: float,
                           cap_pairs: int) -> SelfContactSet:
    """Narrow phase over an explicit candidate pair list (all-pairs oracle
    path; the production path is detect_self_collisions_sweep)."""
    cap_pairs = min(cap_pairs, int(cand.shape[0]))
    i = cand[:, 0]
    j = cand[:, 1]
    return _narrow_phase(i, j, jnp.ones(i.shape, bool), radii, x, v, h,
                         cap_pairs)


def detect_self_collisions_matrix(allowed_triu: jnp.ndarray,
                                  radii: jnp.ndarray,
                                  x: jnp.ndarray, v: jnp.ndarray, h: float,
                                  k_partners: int,
                                  cap_pairs: int) -> SelfContactSet:
    """MXU-native detection: both swept samples as n x n distance matrices.

    The reference's swept test keeps min distance over t in {0, tMid, h}
    with tMid = -2 (dv.p0)/|dv|^2 (Simulation.cpp:207) — twice the true
    minimizer, which makes |p0 + tMid dv| == |p0| EXACTLY, so the test
    reduces to min(d0, d1) < r_i + r_j.  Both d0 and d1 = |(x+hv)_i -
    (x+hv)_j| are pairwise-distance matrices: |a_i|^2 + |a_j|^2 - 2 a a^T,
    one (n,3)@(3,n) MXU matmul each.  Extraction is per-row: K argmin
    passes pull at most `k_partners` partners per particle (self-contact
    degree is tiny), each pass a lane reduction — no sort, no O(n^2)
    cumsum, no large scatter anywhere.  Overflow = a particle with more
    than K in-reach partners OR more than cap_pairs total (both bump at
    recompile).

    `allowed_triu` is the upper-triangular non-adjacency mask
    (~conn_table & triu(k=1)): each unordered pair tested once, adjacency
    excluded as the reference does via pointpointConnectionTable
    (Simulation.cpp:319).  O(n^2) memory — use the sweep variant beyond
    ~10k vertices."""
    n = x.shape[0]
    BIG = jnp.asarray(jnp.inf, x.dtype)

    def pdist2(a):
        sq = jnp.sum(a * a, axis=-1)
        cross = jnp.matmul(a, a.T, precision=jax.lax.Precision.HIGHEST)
        return sq[:, None] + sq[None, :] - 2.0 * cross

    d0 = pdist2(x)
    d1 = pdist2(x + h * v)
    reach = radii.astype(x.dtype)[:, None] + radii.astype(x.dtype)[None, :]
    hit = (jnp.minimum(d0, d1) < reach * reach) & allowed_triu
    dm = jnp.where(hit, jnp.minimum(d0, d1), BIG)

    # rows with any hit are RARE: compact them first so the K extraction
    # passes traverse (R, n) instead of (n, n) — the full matrix is touched
    # exactly once after this point
    rows = jnp.arange(n, dtype=jnp.int32)
    rowhit = jnp.any(hit, axis=1)
    R = min(cap_pairs, n)          # each hit row yields >= 1 pair
    rpos = jnp.cumsum(rowhit.astype(jnp.int32)) - 1
    rtgt = jnp.where(rowhit & (rpos < R), rpos, R)
    row_idx = jnp.zeros((R,), jnp.int32).at[rtgt].set(rows, mode="drop")
    row_valid = jnp.zeros((R,), bool).at[rtgt].set(True, mode="drop")
    row_overflow = jnp.sum(rowhit) > R
    dmr = dm[row_idx]              # (R, n)

    rowsR = jnp.arange(R, dtype=jnp.int32)
    parts_j, parts_ok = [], []
    for _ in range(k_partners):
        jmin = jnp.argmin(dmr, axis=1).astype(jnp.int32)
        val = jnp.take_along_axis(dmr, jmin[:, None], axis=1)[:, 0]
        parts_j.append(jmin)
        parts_ok.append(jnp.isfinite(val) & row_valid)
        dmr = dmr.at[rowsR, jmin].set(BIG)
    row_overflow = row_overflow | jnp.any(
        jnp.isfinite(jnp.min(dmr, axis=1)) & row_valid)

    i = jnp.tile(row_idx, k_partners)
    j = jnp.concatenate(parts_j)
    valid = jnp.concatenate(parts_ok)

    # compact R*k entries to cap_pairs (tiny compared to the pair space)
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    tgt = jnp.where(valid & (pos < cap_pairs), pos, cap_pairs)
    p0 = x[i] - x[j]
    nrm_all = p0 / jnp.maximum(
        jnp.linalg.norm(p0, axis=-1, keepdims=True), 1e-12)
    pi = jnp.zeros((cap_pairs,), jnp.int32).at[tgt].set(i, mode="drop")
    pj = jnp.zeros((cap_pairs,), jnp.int32).at[tgt].set(j, mode="drop")
    nrm = jnp.zeros((cap_pairs, 3), x.dtype).at[tgt].set(nrm_all,
                                                         mode="drop")
    mask = jnp.zeros((cap_pairs,), bool).at[tgt].set(True, mode="drop")
    overflow = (jnp.sum(valid) > cap_pairs) | row_overflow
    return SelfContactSet(
        pair_i=pi, pair_j=pj, normal=nrm, mask=mask,
        layer=jnp.full((cap_pairs,), -1, jnp.int32), overflow=overflow)


def detect_self_collisions_sweep(allowed: jnp.ndarray, radii: jnp.ndarray,
                                 x: jnp.ndarray, v: jnp.ndarray, h: float,
                                 window: int,
                                 cap_pairs: int) -> SelfContactSet:
    """Broad phase (sweep-and-prune) + narrow phase, all inside jit.

    The reference prunes candidate pairs with a 1-D uniform grid on the
    longest AABB axis (≤512 cells, Simulation.cpp:278-356) plus a hard
    `dist > 1.0` cutoff (:323).  The TPU-native equivalent sorts particles
    along the longest *current* AABB axis and considers only pairs within
    `window` positions in sorted order whose axis gap is below the
    conservative reach

        gap < r_i + r_j + h (|v_i| + |v_j|)

    — a lower bound on the swept minimum distance, so no truly colliding
    pair is ever pruned.  Pairs the window cannot see (more than `window`
    particles inside one reach-length slab) raise the overflow flag so the
    window can be bumped at recompile; per-step cost is O(n log n) for the
    sort plus O(n * window) for the tests, with no O(n^2) term anywhere.

    `allowed` is the (n,n) symmetric non-adjacency table (~conn_table with
    zero diagonal); mesh-adjacent pairs are excluded exactly as the
    reference excludes them via pointpointConnectionTable
    (Simulation.cpp:319)."""
    n = x.shape[0]
    window = min(window, n - 1)
    lo = jnp.min(x, axis=0)
    hi = jnp.max(x, axis=0)
    ax = jnp.argmax(hi - lo)
    key = jnp.sum(x * jax.nn.one_hot(ax, 3, dtype=x.dtype)[None, :], axis=-1)
    perm = jnp.argsort(key).astype(jnp.int32)
    skey = key[perm]
    speed = jnp.linalg.norm(v, axis=-1)
    s_srt = speed[perm]
    r_srt = radii.astype(x.dtype)[perm]

    pos = jnp.arange(n, dtype=jnp.int32)[None, :]          # (1,n)
    off = jnp.arange(1, window + 1, dtype=jnp.int32)[:, None]  # (W,1)
    pos2 = pos + off                                       # (W,n)
    in_range = pos2 < n
    pos2c = jnp.minimum(pos2, n - 1)
    i = jnp.broadcast_to(perm[None, :], pos2.shape)        # (W,n)
    j = perm[pos2c]
    gap = skey[pos2c] - skey[None, :]
    reach = (r_srt[None, :] + r_srt[pos2c]
             + h * (s_srt[None, :] + s_srt[pos2c]))
    near = gap < reach
    adj_ok = allowed[i.reshape(-1), j.reshape(-1)].reshape(i.shape)
    valid = in_range & near & adj_ok

    # window-miss detection: if the particle `window` slots ahead is still
    # within the most conservative reach bound, a candidate may have been
    # pruned by the window alone -> flag for a capacity bump
    r_max = jnp.max(r_srt)
    s_max = jnp.max(s_srt)
    key_ahead = jnp.concatenate(
        [skey[window:], jnp.full((window,), jnp.inf, skey.dtype)])
    missed = jnp.any(key_ahead - skey < r_srt + r_max
                     + h * (s_srt + s_max))

    cs = _narrow_phase(i.reshape(-1), j.reshape(-1), valid.reshape(-1),
                       radii, x, v, h, cap_pairs)
    return cs._replace(overflow=cs.overflow | missed)


def assign_layers(contacts: SelfContactSet, n_particles: int,
                  max_layers: int) -> SelfContactSet:
    """K rounds of parallel greedy maximal matching (see module docstring).

    Each round: every unassigned active pair writes its canonical pair id
    (i*n + j, lexicographic — NOT its slot position, so the result is
    independent of the broad phase's candidate ordering) to both endpoints
    with scatter-min; a pair joins the layer iff it won both.
    Invariant: within a layer no particle appears twice.

    (A Luby-style hashed priority would finish chain-shaped contact graphs
    in O(log) rounds instead of one per link, but the resulting layer
    GROUPING differs from the id-ordered greedy the gradient oracles are
    calibrated against, and the rounds run once per step, not per PD
    iteration, so the id order stays.)"""
    slot_ids = contacts.pair_i * jnp.int32(n_particles) + contacts.pair_j
    pri = slot_ids
    BIG = jnp.iinfo(jnp.int32).max

    def round_cond(state):
        layer, unassigned, k = state
        return jnp.logical_and(k < max_layers, jnp.any(unassigned))

    def round_body(state):
        layer, unassigned, k = state
        active = unassigned & contacts.mask

        owner = jnp.full((n_particles,), BIG, jnp.int32)
        ids = jnp.where(active, pri, BIG)
        owner = owner.at[contacts.pair_i].min(ids, mode="drop")
        owner = owner.at[contacts.pair_j].min(ids, mode="drop")
        win = active & (owner[contacts.pair_i] == pri) & \
            (owner[contacts.pair_j] == pri)
        layer = jnp.where(win, k, layer)
        return layer, unassigned & ~win, k + 1

    layer = contacts.layer
    unassigned = contacts.mask
    # while_loop: real contact graphs need 1-4 layers; don't pay for the cap
    layer, unassigned, _ = jax.lax.while_loop(
        round_cond, round_body,
        (layer, unassigned, jnp.asarray(0, jnp.int32)))
    # leftovers (degenerate dense clusters beyond K layers) get dropped from
    # friction this step — mirrored by masking them out entirely
    mask = contacts.mask & (layer >= 0)
    return contacts._replace(layer=layer, mask=mask)


class SelfContactTables(NamedTuple):
    """Per-layer partner tables — the gather-only dual of the pair list.

    TPU rationale: the pair-list friction scatter-adds r_pair into both
    endpoints with DUPLICATE indices across layers, which XLA lowers to a
    sequential per-index loop (~0.4 ms per scatter at tshirt scale) — run
    inside every PD iteration this dominated the whole contact step (round-3
    on-chip bisection, tools/step_profile.py).  The layering invariant
    (each particle at most once per layer) means a per-layer (n,) partner
    index is lossless; friction then needs NO scatter at all: every row
    gathers its partner's state and writes only itself.  Both endpoints
    compute the same force with sign-flipped (normal, d) inputs, and
    `dry_friction_force` is exactly odd under that flip (every op is
    sign-exact), so Newton's third law holds bitwise."""
    partner: jnp.ndarray    # (L, n) int32 partner index, -1 = none
    normal: jnp.ndarray     # (L, n, 3) row-signed normal (partner -> row)
    n_layers: jnp.ndarray   # () int32 — number of populated layers


def build_layer_tables(contacts: SelfContactSet, n_particles: int,
                       max_layers: int) -> SelfContactTables:
    """Pair list -> per-layer partner tables, one unique-index scatter pass
    (per STEP, amortized over all PD iterations).  Requires layered
    contacts (assign_layers output, or kernel slot layers)."""
    C = contacts.pair_i.shape[0]
    L = max_layers
    lay = contacts.layer
    valid = contacts.mask & (lay >= 0) & (lay < L)
    # flat (layer, particle) addresses; invalid entries get unique
    # out-of-bounds slots (L*n + slot) so unique_indices holds exactly
    oob = L * n_particles + jnp.arange(C, dtype=jnp.int32)
    addr_i = jnp.where(valid, lay * n_particles + contacts.pair_i, oob)
    addr_j = jnp.where(valid, lay * n_particles + contacts.pair_j, oob)
    flat_p = jnp.full((L * n_particles,), -1, jnp.int32)
    flat_p = flat_p.at[addr_i].set(contacts.pair_j, mode="drop",
                                   unique_indices=True)
    flat_p = flat_p.at[addr_j].set(contacts.pair_i, mode="drop",
                                   unique_indices=True)
    flat_n = jnp.zeros((L * n_particles, 3), contacts.normal.dtype)
    # stored normal points j -> i (normalized x_i - x_j): row i keeps +n,
    # row j gets -n so each row's (normal, d) pair is its own perspective
    flat_n = flat_n.at[addr_i].set(contacts.normal, mode="drop",
                                   unique_indices=True)
    flat_n = flat_n.at[addr_j].set(-contacts.normal, mode="drop",
                                   unique_indices=True)
    n_layers = jnp.max(jnp.where(valid, lay, -1)) + 1
    return SelfContactTables(
        partner=flat_p.reshape(L, n_particles),
        normal=flat_n.reshape(L, n_particles, 3),
        n_layers=n_layers.astype(jnp.int32))


def self_friction_tables(f: jnp.ndarray, tables: SelfContactTables,
                         mass: jnp.ndarray, r_init: jnp.ndarray,
                         max_layers: int, dry_friction_force,
                         differentiable: bool = False,
                         unroll: int = 0) -> jnp.ndarray:
    """Layered Gauss–Seidel self-contact friction on partner tables —
    identical math to `self_friction` (calculateDryFrictionVector,
    Simulation.cpp:655-676) but scatter-free: per layer, each particle
    gathers its unique partner and updates only its own row.

    differentiable=True uses a static fori_loop over the layer cap (the
    residual is reverse-differentiated and dynamic-bound while_loops have
    no reverse rule); the forward PD loop early-exits at the populated
    layer count.

    unroll > 0 replaces the loop construct entirely with a Python unroll
    over min(unroll, max_layers) layers — fully fusible straight-line code
    (a vmapped dynamic while_loop nested in the PD loop breaks XLA fusion
    and round-trips the carried state through HBM every trip; measured as
    the dominant full-contact cost at tshirt scale, r4 bisection).  Layers
    beyond the unroll bound are dropped from friction exactly like layers
    beyond max_layers are dropped by assign_layers."""
    MU_CLOTH = 0.1
    m_safe = jnp.maximum(mass, 1e-30)

    def apply_layer(r, l):
        p = tables.partner[l]                       # (n,)
        has = p >= 0
        pc = jnp.maximum(p, 0)
        fr = f + r
        fhat = fr / m_safe[:, None]
        d = fhat - fhat[pc]                         # row minus partner
        k_red = mass * mass[pc] / jnp.maximum(mass + mass[pc], 1e-30)
        mu = jnp.full(p.shape, MU_CLOTH, f.dtype)
        r_row = k_red[:, None] * dry_friction_force(tables.normal[l], d, mu)
        return r + jnp.where(has[:, None], r_row, 0.0)

    if unroll > 0:
        r = r_init
        for l in range(min(unroll, max_layers)):
            r = apply_layer(r, l)
        return r

    if differentiable:
        return jax.lax.fori_loop(
            0, max_layers, lambda l, r: apply_layer(r, l), r_init)

    r_out, _ = jax.lax.while_loop(
        lambda s: s[1] < tables.n_layers,
        lambda s: (apply_layer(s[0], s[1]), s[1] + 1),
        (r_init, jnp.asarray(0, jnp.int32)))
    return r_out


def layer_tables_from_partners(partner_nk: jnp.ndarray,
                               x: jnp.ndarray,
                               max_layers: int,
                               with_normals: bool = True
                               ) -> SelfContactTables:
    """Symmetric per-row partner lists -> per-layer partner tables with NO
    scatter anywhere (the production TPU pipeline).

    `partner_nk` (n, K) int32: ALL contact partners of each particle (-1 =
    empty) — each unordered pair (p, q) appears in BOTH row p and row q
    (the Pallas kernel run on the symmetric admissibility table emits
    exactly this).  The greedy matching that `assign_layers` runs on the
    pair list is re-expressed on the table:

      per round: owner[p] = min over p's entries of the canonical pair id
                 (min(p,q)*n + max(p,q)) — a LANE REDUCTION over K, not a
                 scatter-min over a pair list (TPU scatters with duplicate
                 indices lower to sequential per-index loops);
                 entry (p,q) wins iff owner[p] == owner[q] == its id — two
                 gathers + compares.

    Identical priorities and win condition => identical (pair -> layer)
    maps to assign_layers on the same contact set.  A particle wins at most
    one entry per round (owner[p] equals exactly one of its ids), so each
    (layer, particle) slot holds at most one partner and the per-layer
    table is built by a masked lane reduction too.  Rows whose kernel
    count overflowed K drop the missing pairs SYMMETRICALLY: the win
    condition requires both owners to agree, and an owner never saw the
    dropped id.  int32 pair ids require n <= 46340 (n^2 < 2^31); larger
    meshes use the sweep path.

    reference: contactSorting (Simulation.cpp:422-624)."""
    n, K = partner_nk.shape
    valid = partner_nk >= 0
    pc = jnp.maximum(partner_nk, 0)
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    # KNOWN LIMITATION on overflow steps (ADVICE r4): when a row exceeds K
    # partners, the surviving one-sided (dangling) entry can never win the
    # matching (the win condition needs both owners), yet it participates
    # in every owner-min round — if it is that particle's minimum id it
    # blocks the particle from matching ANY of its contacts, so an
    # overflow step can drop additional, non-overflowing pairs.  The
    # reciprocity pre-filter that would fix this needs an (n, K) batched
    # row gather per step — measured at ~6 ms/step at B=64 on v5e (the
    # slowest primitive in the engine) for a condition that never occurs
    # on healthy steps.  Overflow is FLAGGED (selfcol_overflow), which
    # already gates trust in the step; bump K instead of paying the
    # gather.
    pri = (jnp.minimum(rows, pc) * jnp.int32(n)
           + jnp.maximum(rows, pc))                      # (n,K) canonical id
    BIG = jnp.iinfo(jnp.int32).max

    def round_cond(state):
        layer, unassigned, k = state
        return jnp.logical_and(k < max_layers, jnp.any(unassigned & valid))

    def round_body(state):
        layer, unassigned, k = state
        active = unassigned & valid
        ids = jnp.where(active, pri, BIG)
        owner = jnp.min(ids, axis=1)                     # (n,)
        win = active & (owner[:, None] == pri) & (owner[pc] == pri)
        layer = jnp.where(win, k, layer)
        return layer, unassigned & ~win, k + 1

    layer0 = jnp.full((n, K), -1, jnp.int32)
    layer, _, _ = jax.lax.while_loop(
        round_cond, round_body,
        (layer0, valid, jnp.asarray(0, jnp.int32)))

    # per-layer tables by masked lane reduction (<= 1 winner per slot)
    L = max_layers
    lay3 = layer[None, :, :]                             # (1, n, K)
    lsel = jnp.arange(L, dtype=jnp.int32)[:, None, None]  # (L, 1, 1)
    hit = (lay3 == lsel)                                 # (L, n, K)
    partner = jnp.max(jnp.where(hit, pc[None], -1), axis=2)  # (L, n)
    n_layers = jnp.max(layer) + 1
    if not with_normals:
        # the kernel-geometry consumer computes normals per compact SLOT
        # (friction_pallas.build_kernel_geom); building them here costs an
        # (L*n,)-row batched gather of x — measured 8.3 ms/step at B=64
        # (the single largest op in the r5 trace), for <=C actual contacts
        normal = jnp.zeros((L, n, 3), x.dtype)
        return SelfContactTables(partner=partner, normal=normal,
                                 n_layers=n_layers.astype(jnp.int32))
    has = partner >= 0
    pcl = jnp.maximum(partner, 0)
    diff = x - x[pcl.reshape(-1)].reshape(L, n, 3)       # row - partner
    nrm = diff / jnp.maximum(
        jnp.linalg.norm(diff, axis=-1, keepdims=True), 1e-12)
    normal = jnp.where(has[:, :, None], nrm.astype(x.dtype), 0.0)
    return SelfContactTables(partner=partner, normal=normal,
                             n_layers=n_layers.astype(jnp.int32))


class CompactLayers(NamedTuple):
    """Per-layer compact contact slots for MXU-matmul friction.

    The gather-path friction (`self_friction_tables`) pays two (B, n)
    batched row gathers per layer per PD iteration; on v5e those gathers
    are the slowest primitive in the entire contact step (r4 bisection:
    full 380 steps/s vs 5190 with friction ablated, and a static unroll
    does not help — the gathers themselves are the cost).  This form
    compacts each layer's active rows into C static slots and replaces
    every gather/scatter with thin one-hot matmuls:

        vals_row  = exp_l^T fhat     (C,n)@(n,3)   == fhat[row_idx]
        vals_part = sel_l^T fhat                   == fhat[partner_idx]
        r        += exp_l  r_slot    (n,C)@(C,3)   == row-scatter

    One-hot rows have exactly one nonzero, so the contraction is EXACT in
    f32 (order-independent single products) — bitwise equal to the gather
    path at HIGHEST precision.  Slots beyond a layer's active count carry
    zero normals and zero reduced mass, so they contribute exactly zero.

    Overflow: if a layer has more active rows than its slot budget the
    surplus rows are dropped UNSYMMETRICALLY (a pair's two rows can land
    on opposite sides of the cap), so `overflow` must gate trust in the
    step exactly like detection overflow does."""
    exp: tuple       # per layer: (n, C_l) one-hot of row index
    selcat: tuple    # per layer: (n, 2*C_l) [row one-hot | partner one-hot]
    #                  — ONE select matmul reads the force state once
    normal: tuple    # per layer: (C_l, 3) row-signed normal
    area_row: tuple  # per layer: (C_l,) lumped area of the row vertex
    area_part: tuple # per layer: (C_l,) lumped area of the partner vertex
    overflow: jnp.ndarray  # () bool — slot budget exceeded


def compact_slot_budgets(n_layers: int, c0: int = 256,
                         c_rest: int = 128) -> tuple:
    """Static per-layer slot budgets, tapered: greedy matching packs most
    pairs into the earliest layers (measured tshirt rollouts: <=3 layers,
    <=77 pairs total), and per-slot cost is one-hot HBM traffic."""
    taper = [c0] + [c_rest] + [c_rest // 2] * max(n_layers - 2, 0)
    return tuple(taper[:max(n_layers, 1)])


def build_compact_layers(tables: SelfContactTables, area: jnp.ndarray,
                         n_particles: int,
                         budgets: tuple) -> CompactLayers:
    """Partner tables -> per-layer compact slots (once per STEP, amortized
    over all PD iterations).  Gathers/scatters here are per-step, not
    per-iteration; the loop body then touches only matmuls."""
    n = n_particles
    iota = jnp.arange(n, dtype=jnp.int32)
    exp, sel, nrm, a_row, a_part = [], [], [], [], []
    overflow = jnp.asarray(False)
    for l, C in enumerate(budgets):
        p = tables.partner[l]
        has = p >= 0
        pos = jnp.cumsum(has.astype(jnp.int32)) - 1
        # unique OOB addresses for dropped entries so the unique_indices
        # promise holds exactly (ADVICE r4: routing every drop to the
        # single index C is undefined behavior per scatter semantics)
        tgt = jnp.where(has & (pos < C), pos, C + iota)
        row_idx = jnp.full((C,), -1, jnp.int32).at[tgt].set(
            iota, mode="drop", unique_indices=True)
        part_idx = jnp.full((C,), -1, jnp.int32).at[tgt].set(
            p, mode="drop", unique_indices=True)
        overflow = overflow | (jnp.sum(has) > C)
        valid = row_idx >= 0
        rc = jnp.maximum(row_idx, 0)
        pc = jnp.maximum(part_idx, 0)
        e = (iota[:, None] == row_idx[None, :]).astype(area.dtype)
        s = (iota[:, None] == part_idx[None, :]).astype(area.dtype)
        exp.append(e)
        sel.append(jnp.concatenate([e, s], axis=1))
        nrm.append(jnp.where(valid[:, None],
                             tables.normal[l][rc], 0.0))
        a_row.append(jnp.where(valid, area[rc], 0.0))
        a_part.append(jnp.where(valid, area[pc], 0.0))
    return CompactLayers(exp=tuple(exp), selcat=tuple(sel),
                         normal=tuple(nrm),
                         area_row=tuple(a_row), area_part=tuple(a_part),
                         overflow=overflow)


def self_friction_compact(f: jnp.ndarray, compact: CompactLayers,
                          density, mass: jnp.ndarray, r_init: jnp.ndarray,
                          dry_friction_force,
                          precision=None) -> jnp.ndarray:
    """Layered Gauss–Seidel friction on compact slots: per layer, three
    thin matmuls and elementwise math — no gather, no scatter, no dynamic
    loop.  Bitwise-equivalent to `self_friction_tables` on the same layers
    (one-hot contractions are exact single products)."""
    import os

    import jax as _jax
    MU_CLOTH = 0.1
    if precision is None:
        # experiment knob: the one-hot side is exact at any precision, so
        # lower precision only rounds fhat/r_slot to bf16 (<=0.4% on the
        # friction force) while cutting the dominant one-hot HBM re-reads
        # from 3 passes to 1.  Default stays exact (HIGHEST).
        env = os.environ.get("DIFFCLOTH_FRICTION_PRECISION", "")
        if env:
            precision = getattr(_jax.lax.Precision, env.upper())
        else:
            from diffcloth_tpu.core import dense_ops as _dn
            precision = _dn.HI
    # carry fr = f + r directly: per layer ONE select matmul reads fr once
    # ([row|partner] one-hots concatenated), the division happens in slot
    # space (selection of fr/m == selection of fr, then divide — exact),
    # and the scatter-back updates fr in place.  Saves the (B,n,3) fhat
    # materialization + second full-state read per layer (HBM-bound).
    fr = f + r_init
    for exp_l, selcat_l, nrm_l, ar_l, ap_l in zip(
            compact.exp, compact.selcat, compact.normal,
            compact.area_row, compact.area_part):
        C = exp_l.shape[1]
        vals = jnp.matmul(selcat_l.T, fr, precision=precision)   # (2C,3)
        m_row = density * ar_l
        m_part = density * ap_l
        # masked reciprocals, then MULTIPLY: dividing by the 1e-30 guard
        # makes the division VJP square the guard, which UNDERFLOWS f32
        # (1e-60 -> 0) and turns empty slots' 0-valued cotangents into
        # 0/0 = NaN in dL/d(density) — caught on the dress task (f64 CPU
        # tests cannot see it)
        # double-where: the reciprocal's operand must itself be guarded,
        # or the untaken branch's VJP still computes -cot/m^2 at m=0
        m_row_safe = jnp.where(ar_l > 0, m_row, 1.0)
        m_part_safe = jnp.where(ap_l > 0, m_part, 1.0)
        imr = jnp.where(ar_l > 0, 1.0 / m_row_safe, 0.0)
        imp = jnp.where(ap_l > 0, 1.0 / m_part_safe, 0.0)
        d = vals[:C] * imr[:, None] - vals[C:] * imp[:, None]
        msum = m_row + m_part
        msum_safe = jnp.where(msum > 0, msum, 1.0)   # same underflow trap
        k_red = jnp.where(msum > 0, m_row * m_part / msum_safe, 0.0)
        mu = jnp.full(ar_l.shape, MU_CLOTH, f.dtype)
        r_slot = k_red[:, None] * dry_friction_force(nrm_l, d, mu)
        fr = fr + jnp.matmul(exp_l, r_slot, precision=precision)
    return fr - f   # == r_init + sum of per-layer contributions


def empty_layer_tables(n_particles: int, max_layers: int,
                       dtype=jnp.float32) -> SelfContactTables:
    """All-empty partner tables (profiling ablations / no-contact paths)."""
    return SelfContactTables(
        partner=jnp.full((max_layers, n_particles), -1, jnp.int32),
        normal=jnp.zeros((max_layers, n_particles, 3), dtype),
        n_layers=jnp.asarray(0, jnp.int32))


def empty_self_contacts(cap_pairs: int, dtype=jnp.float32) -> SelfContactSet:
    return SelfContactSet(
        pair_i=jnp.zeros((cap_pairs,), jnp.int32),
        pair_j=jnp.zeros((cap_pairs,), jnp.int32),
        normal=jnp.zeros((cap_pairs, 3), dtype),
        mask=jnp.zeros((cap_pairs,), bool),
        layer=jnp.full((cap_pairs,), -1, jnp.int32),
        overflow=jnp.asarray(False))


def self_friction(f: jnp.ndarray, contacts: SelfContactSet,
                  mass: jnp.ndarray, r_init: jnp.ndarray,
                  max_layers: int, dry_friction_force,
                  differentiable: bool = False) -> jnp.ndarray:
    """Layered Gauss–Seidel self-contact friction.

    reference: calculateDryFrictionVector (Simulation.cpp:655-676): per
    layer, for each pair (A,B): d = (f_A + r_A)/m_A - (f_B + r_B)/m_B with
    the r accumulated from previous layers; r_pair = k * friction(n, d,
    mu_cloth) with reduced mass k = m_A m_B/(m_A+m_B) and mu_cloth = 0.1
    hard-coded (Simulation.cpp:666-668); r_A += r_pair, r_B -= r_pair.

    differentiable=True uses a static fori_loop over the layer cap (the
    adjoint residual is reverse-differentiated, and while_loop with a
    dynamic bound has no reverse rule); the forward PD loop uses an
    early-exit while_loop over the layers actually populated (1-4)."""
    MU_CLOTH = 0.1
    i = contacts.pair_i
    j = contacts.pair_j
    # clamp masses away from zero: with a degenerate (zero-density) guess
    # the reduced mass k_red is already 0 so the friction force vanishes,
    # but a literal 0-mass division would put non-finite entries in the
    # residual Jacobian and poison the adjoint VJP (0 * inf = NaN)
    m_i = jnp.maximum(mass[i], 1e-30)
    m_j = jnp.maximum(mass[j], 1e-30)
    k_red = mass[i] * mass[j] / jnp.maximum(mass[i] + mass[j], 1e-30)
    mu = jnp.full(i.shape, MU_CLOTH, f.dtype)

    def apply_layer(r, l):
        in_layer = contacts.mask & (contacts.layer == l)
        f_i = f[i] + r[i]
        f_j = f[j] + r[j]
        d = f_i / m_i[:, None] - f_j / m_j[:, None]
        r_pair = k_red[:, None] * dry_friction_force(contacts.normal, d, mu)
        r_pair = jnp.where(in_layer[:, None], r_pair, 0.0)
        r = r.at[i].add(r_pair, mode="drop")
        r = r.at[j].add(-r_pair, mode="drop")
        return r

    if differentiable:
        return jax.lax.fori_loop(
            0, max_layers, lambda l, r: apply_layer(r, l), r_init)

    n_layers = jnp.max(jnp.where(contacts.mask, contacts.layer, -1)) + 1
    r_out, _ = jax.lax.while_loop(
        lambda s: s[1] < n_layers,
        lambda s: (apply_layer(s[0], s[1]), s[1] + 1),
        (r_init, jnp.asarray(0, jnp.int32)))
    return r_out
