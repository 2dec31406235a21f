"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4e).

Covers: sharded chains (device-count invariance), collective acceptance
adaptation (psum), parallel tempering (ppermute boundary exchange), and SMC
(all_gather resampling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mh_tpu.config import SamplerConfig
from mh_tpu.models.scene import demo_scene
from mh_tpu.parallel.mesh import chain_mesh, device_report
from mh_tpu.parallel.sharded import run_chains_collective, run_chains_sharded
from mh_tpu.sampler.smc import run_smc, systematic_resample_indices
from mh_tpu.sampler.tempering import geometric_ladder, run_tempered


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8
    assert "8 global devices" in device_report().replace("8 local / 8", "8 local / 8")


def test_sharded_chains_device_count_invariant():
    """Chain results must be bitwise identical on 1-device and 8-device meshes."""
    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=30, n_chains=16)
    key = jax.random.key(0)
    s1 = run_chains_sharded(key, spec.initial_pose(), scene, cfg, chain_mesh(1))
    s8 = run_chains_sharded(key, spec.initial_pose(), scene, cfg, chain_mesh(8))
    np.testing.assert_array_equal(np.asarray(s1.pose), np.asarray(s8.pose))
    np.testing.assert_array_equal(np.asarray(s1.n_accept), np.asarray(s8.n_accept))


def test_sharded_chains_bad_divisibility():
    spec = demo_scene(4)
    cfg = SamplerConfig(iterations=5, n_chains=3)
    with pytest.raises(ValueError, match="divisible"):
        run_chains_sharded(
            jax.random.key(0), spec.initial_pose(), spec.build(), cfg, chain_mesh(8)
        )


def test_collective_adaptation_converges_rate():
    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(
        iterations=0, n_chains=64, adapt_rate=0.3, target_accept=0.3
    )
    states, rates, log_scale = run_chains_collective(
        jax.random.key(1), spec.initial_pose(), scene, cfg,
        chain_mesh(8), rounds=25, steps_per_round=8,
    )
    rates = np.asarray(rates)
    assert rates.shape == (25,)
    assert np.all((rates >= 0) & (rates <= 1))
    assert float(log_scale) != 0.0  # adaptation actually moved the scale
    # late-phase rates should hover near the target
    assert abs(rates[-5:].mean() - 0.3) < 0.15


def test_tempering_exchange():
    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=0)
    states, swap_rates = run_tempered(
        jax.random.key(2), spec.initial_pose(), scene, cfg,
        chain_mesh(8), n_replicas=16, exchange_every=3, rounds=10,
    )
    swap_rates = np.asarray(swap_rates)
    assert swap_rates.shape == (10,)
    assert np.all((swap_rates >= 0) & (swap_rates <= 1))
    assert swap_rates.mean() > 0.05  # neighboring temperatures do exchange
    assert np.asarray(states.pose).shape[0] == 16
    assert np.isfinite(np.asarray(states.costs.total)).all()


def test_tempering_ladder():
    b = np.asarray(geometric_ladder(8, 0.1, 2.0))
    assert b[0] == pytest.approx(0.1)
    assert b[-1] == pytest.approx(2.0)
    assert np.all(np.diff(b) > 0)


def test_systematic_resample_statistics():
    log_w = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    counts = np.zeros(4)
    for s in range(200):
        idx = np.asarray(systematic_resample_indices(jax.random.key(s), log_w, 4))
        counts += np.bincount(idx, minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.05)


def test_smc_runs_and_resamples():
    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=0)
    states, diag = run_smc(
        jax.random.key(3), spec.initial_pose(), scene, cfg,
        chain_mesh(8), n_particles=32, n_stages=6, mutate_steps=2,
    )
    assert np.asarray(states.pose).shape[0] == 32
    ess = np.asarray(diag["ess"])
    assert ess.shape == (6,)
    assert np.all(ess >= 1.0) and np.all(ess <= 32.0 + 1e-3)
    assert np.isfinite(float(diag["log_evidence"]))
    assert np.isfinite(np.asarray(diag["log_weights"])).all()


def test_tempering_device_count_invariant():
    """ppermute boundary exchange must equal the 1-device local path bitwise."""
    spec = demo_scene(6)
    scene = spec.build()
    cfg = SamplerConfig(iterations=0)
    s1, r1 = run_tempered(
        jax.random.key(0), spec.initial_pose(), scene, cfg, chain_mesh(1),
        n_replicas=16, exchange_every=3, rounds=12,
    )
    s8, r8 = run_tempered(
        jax.random.key(0), spec.initial_pose(), scene, cfg, chain_mesh(8),
        n_replicas=16, exchange_every=3, rounds=12,
    )
    np.testing.assert_array_equal(np.asarray(s1.pose), np.asarray(s8.pose))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r8))


def test_smc_device_count_invariant():
    """all_gather resampling must equal the 1-device path bitwise."""
    spec = demo_scene(6)
    scene = spec.build()
    cfg = SamplerConfig(iterations=0)
    s1, d1 = run_smc(
        jax.random.key(2), spec.initial_pose(), scene, cfg, chain_mesh(1),
        n_particles=16, n_stages=5, mutate_steps=2,
    )
    s8, d8 = run_smc(
        jax.random.key(2), spec.initial_pose(), scene, cfg, chain_mesh(8),
        n_particles=16, n_stages=5, mutate_steps=2,
    )
    np.testing.assert_array_equal(np.asarray(s1.pose), np.asarray(s8.pose))
    np.testing.assert_allclose(
        np.asarray(d1["ess"]), np.asarray(d8["ess"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(d1["log_evidence"]), float(d8["log_evidence"]), rtol=1e-6
    )


def test_tempering_adaptive_ladder():
    """adapt_ladder: top beta pinned, ladder stays ascending, gaps move,
    and the adapted ladder is device-count invariant (psum-replicated
    updates from globally-indexed pair decisions)."""
    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=0)
    args = dict(n_replicas=16, exchange_every=2, rounds=24, adapt_ladder=True)
    s8, r8, b8 = run_tempered(
        jax.random.key(5), spec.initial_pose(), scene, cfg, chain_mesh(8),
        **args,
    )
    b8 = np.asarray(b8)
    b0 = np.asarray(geometric_ladder(16, 0.1, cfg.beta))
    assert b8.shape == (16,)
    assert b8[-1] == pytest.approx(cfg.beta)  # target replica pinned
    assert np.all(np.diff(b8) > 0)  # still a valid ascending ladder
    assert np.abs(b8 - b0).max() > 1e-4  # adaptation actually moved gaps
    assert np.isfinite(np.asarray(s8.costs.total)).all()

    s1, r1, b1 = run_tempered(
        jax.random.key(5), spec.initial_pose(), scene, cfg, chain_mesh(1),
        **args,
    )
    np.testing.assert_array_equal(np.asarray(b1), b8)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r8))
    np.testing.assert_array_equal(np.asarray(s1.pose), np.asarray(s8.pose))


def test_smc_log_evidence_telescopes_exactly():
    """With no resampling and no mutation, the staged evidence must equal
    the direct one-shot estimate log((1/n) sum_i exp(beta * S_i)) over the
    initial particles — this pins the per-stage weight renormalization
    (stages without a resample must not re-count their normalizer)."""
    from mh_tpu.ops.costs import total_cost

    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=0)
    key = jax.random.key(7)
    _, diag = run_smc(
        key, spec.initial_pose(), scene, cfg, chain_mesh(4),
        n_particles=16, n_stages=5, mutate_steps=0, ess_threshold=0.0,
    )
    assert not np.asarray(diag["resampled"]).any()

    # same initial particles as run_smc builds them (all chains share pose0)
    s0 = float(total_cost(jnp.asarray(spec.initial_pose()), scene, cfg.mode))
    direct = cfg.beta * s0  # identical particles: log mean exp == beta*S
    assert float(diag["log_evidence"]) == pytest.approx(direct, rel=1e-5)


def test_smc_adaptive_schedule():
    """Adaptive tempering reaches the target beta within the stage budget,
    with a monotone schedule, and is device-count invariant."""
    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=0)
    args = dict(n_particles=16, n_stages=12, mutate_steps=3, adaptive=True,
                init="prior")
    _, d4 = run_smc(
        jax.random.key(3), spec.initial_pose(), scene, cfg, chain_mesh(4),
        **args,
    )
    betas = np.asarray(d4["betas"])
    ess = np.asarray(d4["ess"])
    # monotone schedule; diverse prior particles force a staged anneal
    # (the demo objective spans thousands of nats at beta=2, so a small
    # stage budget cannot reach the target — the contract is per-stage
    # ESS control, not arrival)
    assert np.all(np.diff(np.concatenate([[0.0], betas])) >= -1e-7)
    assert 0.0 < betas[0] < cfg.beta * 0.99
    # bisection lands each reweight at ~target_ess * n (default 0.5 * 16)
    assert abs(ess[0] - 8.0) < 1.5
    # every ESS-limited stage must resample (else the schedule stalls at
    # exactly the target ESS) and therefore keep advancing
    below = betas[:-1] < cfg.beta * 0.999
    assert np.all(np.diff(betas)[below[: len(betas) - 1]] > 0)
    assert np.isfinite(float(d4["log_evidence"]))

    # degenerate pose0 init: every particle identical => ESS never drops,
    # so the adaptive schedule takes the full jump in stage one
    _, d_point = run_smc(
        jax.random.key(3), spec.initial_pose(), scene, cfg, chain_mesh(4),
        n_particles=16, n_stages=3, mutate_steps=0, adaptive=True,
    )
    assert np.asarray(d_point["betas"])[0] == pytest.approx(cfg.beta)

    _, d1 = run_smc(
        jax.random.key(3), spec.initial_pose(), scene, cfg, chain_mesh(1),
        **args,
    )
    # psum partial-sum order differs across device counts -> ulp-level only
    np.testing.assert_allclose(np.asarray(d1["betas"]), betas, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d1["log_evidence"]), np.asarray(d4["log_evidence"]),
        rtol=1e-5,
    )
