"""Fused Pallas kernel correctness vs the XLA path (TPU hardware only).

The kernel uses on-chip PRNG primitives with no CPU interpreter support, so
these tests run only when a real TPU is the default backend (e.g. via
``MH_TPU_TEST_PLATFORM=axon python -m pytest tests/test_fused_kernel.py``).
"""

import jax
import numpy as np
import pytest

from mh_tpu.config import CostMode, SamplerConfig
from mh_tpu.models.scene import demo_scene
from mh_tpu.ops.costs import cost_terms

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="fused kernel needs TPU PRNG primitives",
)


@pytest.mark.parametrize("mode", [CostMode.PARITY, CostMode.FIXED])
def test_fused_matches_xla_costs(mode):
    from mh_tpu.kernels.fused_mh import run_chains_fused

    spec = demo_scene(32)
    scene = spec.build()
    cfg = SamplerConfig(mode=mode)
    pose, breakdown, n_acc, _ = run_chains_fused(
        0, spec.initial_pose(), scene, cfg, 8, 50
    )
    pose = np.asarray(pose)
    assert not np.isnan(pose).any()
    acc = np.asarray(n_acc)
    assert acc.min() >= 0 and acc.max() <= 50 and acc.mean() > 5
    for c in range(8):
        ref = cost_terms(pose[c], scene, mode)
        np.testing.assert_allclose(
            float(breakdown[c, 0]), float(ref.total), rtol=2e-4, atol=2e-3
        )


@pytest.mark.parametrize("mode", [CostMode.PARITY, CostMode.FIXED])
def test_incremental_matches_full_recompute_bitwise(mode):
    """The carried slab-maxima path must not change the chain trajectory.

    Incremental symmetry recomputes exactly the cells a move invalidates,
    with the same formula and a matching total-summation order, so the
    acceptance decisions — and therefore every pose — are bitwise equal to
    the full-recompute kernel's over a long run.
    """
    from mh_tpu.kernels.fused_mh import run_chains_fused

    spec = demo_scene(48)
    scene = spec.build()
    cfg = SamplerConfig(mode=mode)
    pose_i, bd_i, acc_i, _ = run_chains_fused(
        3, spec.initial_pose(), scene, cfg, 8, 300, incremental=True
    )
    pose_f, bd_f, acc_f, _ = run_chains_fused(
        3, spec.initial_pose(), scene, cfg, 8, 300, incremental=False
    )
    np.testing.assert_array_equal(np.asarray(acc_i), np.asarray(acc_f))
    np.testing.assert_array_equal(np.asarray(pose_i), np.asarray(pose_f))
    np.testing.assert_array_equal(np.asarray(bd_i), np.asarray(bd_f))


def test_fused_zero_iterations_is_identity():
    from mh_tpu.kernels.fused_mh import run_chains_fused

    spec = demo_scene(16)
    scene = spec.build()
    pose, breakdown, n_acc, _ = run_chains_fused(
        7, spec.initial_pose(), scene, SamplerConfig(), 8, 0
    )
    np.testing.assert_allclose(
        np.asarray(pose[0]), np.asarray(spec.initial_pose()), atol=1e-6
    )
    ref = cost_terms(spec.initial_pose(), scene, CostMode.PARITY)
    np.testing.assert_allclose(
        np.asarray(breakdown[0]),
        np.asarray(ref.as_vector()),
        rtol=2e-4,
        atol=2e-3,
    )
    assert int(np.asarray(n_acc)[0]) == 0


@pytest.mark.parametrize("mode", [CostMode.PARITY, CostMode.FIXED])
@pytest.mark.parametrize("incremental", [True, False])
def test_fused_block_proposals(mode, incremental):
    """Compound K-move proposals in-kernel (the reference's blockxDim
    threads, ``Kernel.cu:798-828``): final breakdown must match a fresh
    cost evaluation of the final pose, and the K-move incremental slab
    state must agree with full recompute."""
    from mh_tpu.kernels.fused_mh import run_chains_fused

    spec = demo_scene(24)
    scene = spec.build()
    cfg = SamplerConfig(mode=mode, n_moves_per_step=4)
    pose, breakdown, n_acc, _ = run_chains_fused(
        5, spec.initial_pose(), scene, cfg, 8, 60, incremental=incremental
    )
    pose = np.asarray(pose)
    assert not np.isnan(pose).any()
    acc = np.asarray(n_acc)
    assert acc.min() >= 0 and acc.max() <= 60
    for c in range(8):
        ref = cost_terms(pose[c], scene, mode)
        np.testing.assert_allclose(
            float(breakdown[c, 0]), float(ref.total), rtol=2e-4, atol=2e-3
        )
    # a block of 4 moves must actually move several objects on acceptance
    moved = np.any(pose != np.asarray(spec.initial_pose())[None], axis=2)
    assert moved.sum(axis=1).max() >= 2


@pytest.mark.parametrize("mode", [CostMode.PARITY, CostMode.FIXED])
def test_fused_block_incremental_matches_full_bitwise(mode):
    from mh_tpu.kernels.fused_mh import run_chains_fused

    spec = demo_scene(24)
    scene = spec.build()
    cfg = SamplerConfig(mode=mode, n_moves_per_step=3)
    pose_i, bd_i, acc_i, _ = run_chains_fused(
        9, spec.initial_pose(), scene, cfg, 8, 150, incremental=True
    )
    pose_f, bd_f, acc_f, _ = run_chains_fused(
        9, spec.initial_pose(), scene, cfg, 8, 150, incremental=False
    )
    np.testing.assert_array_equal(np.asarray(acc_i), np.asarray(acc_f))
    np.testing.assert_array_equal(np.asarray(pose_i), np.asarray(pose_f))


def test_fused_step_size_adaptation():
    """In-kernel per-chain Robbins-Monro step-size adaptation drives the
    acceptance rate toward the target (cfg.adapt, like the XLA engine)."""
    from mh_tpu.kernels.fused_mh import run_chains_fused

    spec = demo_scene(16)
    scene = spec.build()
    cfg = SamplerConfig(adapt=True, target_accept=0.8, adapt_rate=0.08)
    pose, _, n_acc, scale = run_chains_fused(
        11, spec.initial_pose(), scene, cfg, 8, 400
    )
    assert not np.isnan(np.asarray(pose)).any()
    rates = np.asarray(n_acc, np.float64) / 400.0
    scale = np.asarray(scale)
    # un-adapted acceptance here is ~0.5; the controller must push it up
    # by shrinking the step scale
    assert rates.mean() > 0.65, rates
    assert scale.mean() < 0.9, scale
    assert np.all(scale > 0)


@pytest.mark.parametrize("mode", [CostMode.PARITY, CostMode.FIXED])
def test_fused_many_clearances_tile_path(mode):
    """Scenes with more than CLR_UNROLL_MAX real clearances take the
    [B, C, N] tile path; its breakdown must match the XLA evaluation just
    like the unrolled path's (both are exercised across the suite)."""
    import dataclasses

    from mh_tpu.kernels.fused_mh import CLR_UNROLL_MAX, run_chains_fused

    spec = demo_scene(16)
    quad = np.array(
        [[-0.6, -0.4], [0.6, -0.4], [0.6, 0.4], [-0.6, 0.4]], np.float32
    )
    extra = [(quad * (1.0 + 0.1 * i), i % 16) for i in range(CLR_UNROLL_MAX)]
    spec = dataclasses.replace(
        spec, clearances=list(spec.clearances) + extra
    ) if dataclasses.is_dataclass(spec) else spec
    assert len(spec.clearances) > CLR_UNROLL_MAX
    scene = spec.build()
    cfg = SamplerConfig(mode=mode)
    pose, breakdown, n_acc, _ = run_chains_fused(
        13, spec.initial_pose(), scene, cfg, 8, 40
    )
    pose = np.asarray(pose)
    assert not np.isnan(pose).any()
    for c in range(8):
        ref = cost_terms(pose[c], scene, mode)
        np.testing.assert_allclose(
            float(breakdown[c, 0]), float(ref.total), rtol=2e-4, atol=2e-3
        )


def test_fused_posterior_statistics_match_xla():
    """BASELINE correctness gate, fused edition: the fused kernel samples
    the same stationary law as the XLA engine (different random streams,
    same distributions) — population mean/spread of the total cost and the
    acceptance rate must agree within Monte-Carlo error after burn-in."""
    from mh_tpu.kernels.fused_mh import run_chains_fused
    from mh_tpu.sampler.mh import run_chains

    spec = demo_scene(16)
    scene = spec.build()
    m, iters = 64, 1500
    cfg = SamplerConfig(iterations=iters, n_chains=m)
    _, bd, n_acc, _ = run_chains_fused(
        17, spec.initial_pose(), scene, cfg, m, iters
    )
    fused_tot = np.asarray(bd[:, 0], np.float64)
    fused_rate = float(np.asarray(n_acc).mean()) / iters

    st, _ = run_chains(jax.random.key(17), spec.initial_pose(), scene, cfg)
    xla_tot = np.asarray(st.costs.total, np.float64)
    xla_rate = float(np.asarray(st.accept_rate).mean())

    sem = np.sqrt(fused_tot.var() / m + xla_tot.var() / m)
    assert abs(fused_tot.mean() - xla_tot.mean()) < 5.0 * sem + 1e-3, (
        fused_tot.mean(), xla_tot.mean(), sem
    )
    assert 0.6 < (fused_tot.std() + 1e-9) / (xla_tot.std() + 1e-9) < 1.6
    assert abs(fused_rate - xla_rate) < 0.08, (fused_rate, xla_rate)


@pytest.mark.parametrize("moves", [1, 4])
def test_fused_accept_draws_lifts_acceptance(moves):
    """``accept_draws=K`` (the ``Kernel.cu:819`` per-thread-accept emulation)
    must lift the realized acceptance toward 1-(1-p)^K in both iteration
    bodies (single-move ``iter_body`` and compound ``iter_body_multi``)."""
    from mh_tpu.kernels.fused_mh import run_chains_fused

    spec = demo_scene(32)
    scene = spec.build()
    iters = 300
    n_chains = 64
    cfg1 = SamplerConfig(n_moves_per_step=moves)
    cfgK = SamplerConfig(n_moves_per_step=moves, accept_draws=16)
    _, _, acc1, _ = run_chains_fused(
        5, spec.initial_pose(), scene, cfg1, n_chains, iters
    )
    _, _, accK, _ = run_chains_fused(
        5, spec.initial_pose(), scene, cfgK, n_chains, iters
    )
    r1 = float(np.asarray(acc1).mean()) / iters
    rK = float(np.asarray(accK).mean()) / iters
    # Compound proposals reject mostly on badly-negative deltas (ratio
    # near 0), where K extra draws rarely save the proposal — measured
    # lift at moves=4 is ~0.14 -> ~0.22 (SE ~0.004 at 64x300 decisions),
    # vs ~0.57 -> ~0.67 at moves=1. Thresholds sit >5 SE below those.
    min_lift = 0.08 if moves == 1 else 0.05
    assert rK > r1 + min_lift, (r1, rK)
    assert rK <= 1.0


def test_fused_sharded_single_device_bitwise():
    """run_chains_fused_sharded on a 1-device mesh must be bitwise equal to
    the unsharded runner (same hardware-PRNG seeds per global block)."""
    from mh_tpu.kernels.fused_mh import (
        run_chains_fused,
        run_chains_fused_sharded,
    )
    from mh_tpu.parallel.mesh import chain_mesh

    spec = demo_scene(32)
    scene = spec.build()
    cfg = SamplerConfig()
    p1, bd1, a1, _ = run_chains_fused(7, spec.initial_pose(), scene, cfg, 16, 100)
    p2, bd2, a2, _ = run_chains_fused_sharded(
        7, spec.initial_pose(), scene, cfg, 16, 100, chain_mesh(1)
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(bd1), np.asarray(bd2))
