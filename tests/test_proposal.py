"""Proposal semantics tests (SURVEY.md C6 — clamp/wrap/swap/frozen)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mh_tpu.config import CostMode, SamplerConfig
from mh_tpu.models.scene import demo_scene
from mh_tpu.sampler import proposal as P

CFG = SamplerConfig(iterations=10)


def _scene_and_pose(n=8, frozen_idx=()):
    spec = demo_scene(n)
    frozen = np.zeros(n, bool)
    for i in frozen_idx:
        frozen[i] = True
    spec.frozen = frozen
    return spec, spec.build(), spec.initial_pose()


def test_translate_clamps_to_surface():
    spec, scene, pose = _scene_and_pose()
    # exaggerate the step so clamping triggers often
    cfg = SamplerConfig(sigma_xy_override=50.0)
    for s in range(50):
        pose = P.translate_move(jax.random.key(s), pose, scene, cfg, jnp.float32(1.0))
    xy = np.asarray(pose)[:, :2]
    assert np.all(xy >= 0.0 - 1e-6) and np.all(xy <= 10.0 + 1e-6)


def test_rotate_wraps():
    spec, scene, pose = _scene_and_pose()
    for s in range(100):
        pose = P.rotate_move(jax.random.key(s), pose, scene, CFG, jnp.float32(1.0))
    rot = np.asarray(pose)[:, 4]
    assert np.all(rot >= 0.0) and np.all(rot <= 2 * CostMode.PARITY.pi + 1e-6)


def test_swap_preserves_pose_multiset():
    spec, scene, pose = _scene_and_pose()
    before = np.sort(np.asarray(pose), axis=0)
    for s in range(20):
        pose = P.swap_move(jax.random.key(s), pose, scene)
    after = np.sort(np.asarray(pose), axis=0)
    np.testing.assert_allclose(after, before)


def test_frozen_objects_never_move():
    spec, scene, pose = _scene_and_pose(frozen_idx=(2, 5))
    orig = np.asarray(pose).copy()
    for s in range(200):
        pose = P.propose(jax.random.key(s), pose, scene, CFG, jnp.float32(1.0))
    out = np.asarray(pose)
    np.testing.assert_allclose(out[2], orig[2])
    np.testing.assert_allclose(out[5], orig[5])


def test_all_frozen_is_noop_not_hang():
    """The reference spins forever here (``Kernel.cu:600-602``); we no-op."""
    spec, scene, pose = _scene_and_pose(n=4, frozen_idx=(0, 1, 2, 3))
    out = P.propose(jax.random.key(0), pose, scene, CFG, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pose))


def test_pick_unfrozen_uniform():
    spec, scene, _ = _scene_and_pose(n=6, frozen_idx=(1, 4))
    keys = jax.random.split(jax.random.key(0), 3000)
    picks = np.asarray(jax.vmap(lambda k: P.pick_unfrozen(k, scene))(keys))
    counts = np.bincount(picks, minlength=scene.n_pad_objs)
    assert counts[1] == 0 and counts[4] == 0
    live = counts[[0, 2, 3, 5]]
    assert live.min() > 0.5 * live.mean()  # roughly uniform


def test_block_propose_moves_multiple_objects():
    spec, scene, pose = _scene_and_pose(n=16)
    cfg = SamplerConfig(n_moves_per_step=8)
    out = P.block_propose(jax.random.key(1), pose, scene, cfg, jnp.float32(1.0))
    changed = np.any(np.asarray(out) != np.asarray(pose), axis=1).sum()
    assert changed >= 2  # K=8 moves should touch several objects


def test_rank_pick_exact_uniform_and_edges():
    """_rank_pick: exact one-hot, exactly uniform over unfrozen, edge-safe.

    Covers the rank-plane edge cases: frozen lanes share a cumsum rank with
    their predecessor, padded lanes hold rank 0 — neither may ever be
    selected; u -> 1.0 must clamp to the last unfrozen object, u = 0 picks
    the first.
    """
    spec, scene, _ = _scene_and_pose(n=6, frozen_idx=(1, 4))
    ok, rank, n_unf = P._unfrozen_ranks(scene)
    n_unf_i = int(n_unf)
    assert n_unf_i == 4

    # dense u grid: each unfrozen object owns an equal u-interval, so an
    # interval-midpoint grid hits each exactly grid/n_unf times
    grid = 400
    us = (np.arange(grid) + 0.5) / grid
    sels = np.asarray(
        jax.vmap(lambda u: P._rank_pick(jnp.float32(u), ok, rank, n_unf))(
            jnp.asarray(us, jnp.float32)
        )
    )
    # every draw is an exact one-hot
    np.testing.assert_array_equal(sels.sum(axis=1), np.ones(grid))
    counts = sels.sum(axis=0)
    unfrozen = [i for i in range(scene.n_pad_objs) if float(ok[i]) > 0]
    frozen_or_pad = [i for i in range(scene.n_pad_objs) if float(ok[i]) == 0]
    assert all(counts[i] == grid // n_unf_i for i in unfrozen)
    assert all(counts[i] == 0 for i in frozen_or_pad)

    # edges: u = 0 -> first unfrozen; u = 1.0 exactly -> clamped to last
    lo = np.asarray(P._rank_pick(jnp.float32(0.0), ok, rank, n_unf))
    hi = np.asarray(P._rank_pick(jnp.float32(1.0), ok, rank, n_unf))
    assert lo.argmax() == unfrozen[0] and lo.sum() == 1
    assert hi.argmax() == unfrozen[-1] and hi.sum() == 1

    # all-frozen scene: all-zero selector (callers gate on n_unf > 0)
    _, scene_f, _ = _scene_and_pose(n=4, frozen_idx=(0, 1, 2, 3))
    ok_f, rank_f, n_unf_f = P._unfrozen_ranks(scene_f)
    sel_f = np.asarray(P._rank_pick(jnp.float32(0.5), ok_f, rank_f, n_unf_f))
    assert sel_f.sum() == 0
