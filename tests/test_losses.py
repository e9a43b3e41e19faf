"""Loss-library oracles for the keypoint loss and its smoothed variant.

reference: Simulation::calculateLossAndGradient ASSISTED_DRESSING_KEYPOINTS
branch (Simulation.cpp:3440-3475) — per keypoint, penalize the farthest
candidate particle.  The tau>0 softmax smoothing is ours (optimization aid
for the sock plateau); tau=0 must reproduce the reference semantics.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcloth_tpu import losses


def _mk_records(x):
    steps = type("S", (), {"x": x})()
    return type("E", (), {"steps": steps, "x0": x[0]})()


@pytest.fixture
def kp_setup():
    K, C, n, N = 3, 5, 12, 6
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(N, n, 3))
    cands = np.full((K, C), -1, np.int32)
    cands[0, :3] = [1, 2, 3]
    cands[1, :2] = [4, 5]
    cands[2, :5] = [6, 7, 8, 9, 10]
    info = losses.LossInfo(
        keypoint_frames=jnp.asarray([2, 3, 6], np.int32),
        keypoint_targets=jnp.asarray(rng.randn(K, 3)),
        keypoint_candidates=jnp.asarray(cands))
    return x, info, cands


def test_keypoint_hard_matches_manual_max(kp_setup):
    x, info, cands = kp_setup
    recs = _mk_records(x)
    got = float(losses.assisted_dressing_keypoints(recs, info))
    xs = np.asarray(x)
    frames = np.asarray(info.keypoint_frames)
    tgts = np.asarray(info.keypoint_targets)
    want = 0.0
    for k in range(frames.shape[0]):
        cl = [c for c in cands[k] if c >= 0]
        d2 = [np.sum((xs[frames[k] - 1][c] - tgts[k]) ** 2) for c in cl]
        want += max(d2)
    want /= frames.shape[0]
    assert got == pytest.approx(want, rel=1e-12)


def test_keypoint_smooth_converges_to_hard(kp_setup):
    x, info, _ = kp_setup
    recs = _mk_records(x)
    hard = float(losses.assisted_dressing_keypoints(recs, info))
    prev_gap = np.inf
    for tau in (1.0, 0.1, 1e-3):
        s = float(losses.assisted_dressing_keypoints(
            recs, dataclasses.replace(info, keypoint_tau=tau)))
        gap = abs(s - hard)
        assert s <= hard + 1e-12      # softmax-weighted mean <= max
        assert gap <= prev_gap + 1e-12
        prev_gap = gap
    assert prev_gap < 1e-6


def test_keypoint_smooth_gradient_reaches_all_candidates(kp_setup):
    x, info, cands = kp_setup
    smooth = dataclasses.replace(info, keypoint_tau=5.0)
    g = jax.grad(lambda xx: losses.assisted_dressing_keypoints(
        _mk_records(xx), smooth))(x)
    assert bool(jnp.all(jnp.isfinite(g)))
    touched = np.asarray(jnp.any(jnp.any(g != 0, axis=-1), axis=0))
    all_cands = sorted({int(c) for c in cands.reshape(-1) if c >= 0})
    for c in all_cands:
        assert touched[c], f"candidate {c} got no gradient at finite tau"
    # the hard max only touches the argmax candidate per keypoint
    gh = jax.grad(lambda xx: losses.assisted_dressing_keypoints(
        _mk_records(xx), info))(x)
    hard_touched = np.asarray(jnp.any(jnp.any(gh != 0, axis=-1), axis=0))
    assert hard_touched.sum() < touched.sum()
