"""MH chain invariants (SURVEY.md §4b): acceptance, determinism, improvement."""

import jax
import jax.numpy as jnp
import numpy as np

from mh_tpu.config import CostMode, SamplerConfig
from mh_tpu.models.scene import demo_scene
from mh_tpu.ops.costs import total_cost
from mh_tpu.sampler.mh import run_chain, run_chains


def test_beta_zero_accepts_everything():
    """At beta=0 the Boltzmann ratio is 1: the chain is a pure random walk."""
    spec = demo_scene(8)
    cfg = SamplerConfig(iterations=64, beta=0.0)
    state, _ = run_chain(jax.random.key(0), spec.initial_pose(), spec.build(), cfg)
    assert int(state.n_accept) == 64


def test_acceptance_rate_sane():
    spec = demo_scene(16)
    cfg = SamplerConfig(iterations=200)
    state, _ = run_chain(jax.random.key(1), spec.initial_pose(), spec.build(), cfg)
    rate = float(state.accept_rate)
    assert 0.01 < rate <= 1.0


def test_chain_improves_score():
    """The sampler maximizes the weighted total at beta=2 (Kernel.cu:712)."""
    spec = demo_scene(16)
    scene = spec.build()
    cfg = SamplerConfig(iterations=300)
    initial = float(total_cost(spec.initial_pose(), scene, cfg.mode))
    state, _ = run_chain(jax.random.key(2), spec.initial_pose(), scene, cfg)
    assert float(state.costs.total) > initial


def test_deterministic_replay():
    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=50)
    s1, _ = run_chain(jax.random.key(3), spec.initial_pose(), scene, cfg)
    s2, _ = run_chain(jax.random.key(3), spec.initial_pose(), scene, cfg)
    np.testing.assert_array_equal(np.asarray(s1.pose), np.asarray(s2.pose))
    s3, _ = run_chain(jax.random.key(4), spec.initial_pose(), scene, cfg)
    assert np.any(np.asarray(s1.pose) != np.asarray(s3.pose))


def test_state_costs_track_pose():
    """The carried breakdown must always equal a fresh evaluation of the pose."""
    spec = demo_scene(12)
    scene = spec.build()
    cfg = SamplerConfig(iterations=120)
    state, _ = run_chain(jax.random.key(5), spec.initial_pose(), scene, cfg)
    fresh = float(total_cost(state.pose, scene, cfg.mode))
    np.testing.assert_allclose(float(state.costs.total), fresh, rtol=1e-4, atol=1e-4)


def test_vmapped_chains_differ_and_match_single():
    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=40, n_chains=4)
    states, _ = run_chains(jax.random.key(6), spec.initial_pose(), scene, cfg)
    poses = np.asarray(states.pose)
    assert poses.shape[0] == 4
    # chains explore independently
    assert np.any(poses[0] != poses[1])
    # chain i of the batch == a single chain run with the same folded key
    k0 = jax.random.fold_in(jax.random.key(6), 0)
    single, _ = run_chain(k0, spec.initial_pose(), scene, SamplerConfig(iterations=40))
    np.testing.assert_array_equal(poses[0], np.asarray(single.pose))


def test_cost_trace_monotone_on_accept():
    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=60)
    state, trace = run_chain(
        jax.random.key(7), spec.initial_pose(), scene, cfg, trace_costs=True
    )
    trace = np.asarray(trace)
    assert trace.shape == (60,)
    assert np.isfinite(trace).all()
    np.testing.assert_allclose(trace[-1], float(state.costs.total), rtol=1e-5)


def test_adaptation_moves_scale():
    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=300, adapt=True, target_accept=0.44)
    state, _ = run_chain(jax.random.key(8), spec.initial_pose(), scene, cfg)
    assert float(state.log_scale) != 0.0


def test_compile_chains_matches_run_chains():
    """Scene-specialized compile path is bitwise-identical to run_chains."""
    from mh_tpu.sampler.mh import compile_chains

    spec = demo_scene(12)
    scene = spec.build()
    cfg = SamplerConfig(iterations=50, n_chains=4)
    key = jax.random.key(3)
    ref, _ = run_chains(key, spec.initial_pose(), scene, cfg)
    fast, _ = compile_chains(scene, cfg)(key, spec.initial_pose())
    np.testing.assert_array_equal(np.asarray(ref.pose), np.asarray(fast.pose))
    np.testing.assert_array_equal(
        np.asarray(ref.n_accept), np.asarray(fast.n_accept)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.costs.total), np.asarray(fast.costs.total)
    )


def test_thin_validation_on_trace_free_paths():
    """thin must divide iterations even when no trace is requested — the
    trace-free fast path forces thin=1 into the impl, which silently
    skipped the contract check (round-3 advisor finding)."""
    import pytest

    from mh_tpu.sampler.mh import compile_chains

    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=10, n_chains=2)
    with pytest.raises(ValueError, match="thin"):
        run_chain(jax.random.key(0), spec.initial_pose(), scene, cfg, thin=3)
    with pytest.raises(ValueError, match="thin"):
        run_chains(jax.random.key(0), spec.initial_pose(), scene, cfg, thin=3)
    with pytest.raises(ValueError, match="thin"):
        compile_chains(scene, cfg, thin=3)


def test_compile_chains_thin_honors_iterations_override():
    """A thin>1 trace-free runner must honor the runtime iterations
    override (round-3 advisor: it silently ran the full static count)."""
    from mh_tpu.sampler.mh import compile_chains

    spec = demo_scene(8)
    scene = spec.build()
    key = jax.random.key(1)
    cfg = SamplerConfig(iterations=8, n_chains=2)
    runner = compile_chains(scene, cfg, thin=2)
    states, _ = runner(key, spec.initial_pose(), iterations=4)
    assert int(np.asarray(states.step).max()) == 4
    ref, _ = run_chains(
        key, spec.initial_pose(), scene,
        SamplerConfig(iterations=4, n_chains=2),
    )
    np.testing.assert_array_equal(np.asarray(ref.pose), np.asarray(states.pose))
