"""Incremental-symmetry chain: exactness vs the full evaluation."""

import jax
import numpy as np
import pytest

from mh_tpu.config import CostMode, SamplerConfig
from mh_tpu.models.scene import demo_scene
from mh_tpu.ops.costs import cost_terms
from mh_tpu.sampler.incremental import (
    full_val_matrix,
    inc_init,
    inc_step,
    run_chains_incremental,
)


def test_incremental_state_stays_exact():
    """After many steps, the carried matrix/total must equal a fresh full eval."""
    spec = demo_scene(16)
    scene = spec.build()
    cfg = SamplerConfig(iterations=0)
    state = inc_init(spec.initial_pose(), scene, jax.random.key(0), n_groups=4)
    for _ in range(60):
        state = jax.jit(inc_step, static_argnames=("cfg", "n_groups"))(
            state, scene, cfg, 4
        )
    # matrix exactness
    fresh = np.asarray(full_val_matrix(state.pose, scene, CostMode.PARITY.pi))
    np.testing.assert_allclose(np.asarray(state.a_mat), fresh, rtol=1e-5, atol=1e-5)
    # total exactness vs the full cost path
    want = float(cost_terms(state.pose, scene, CostMode.PARITY).total)
    np.testing.assert_allclose(float(state.total), want, rtol=1e-4, atol=1e-3)


def test_incremental_trace_matches_full_eval():
    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=40, n_chains=3)
    states, trace = run_chains_incremental(
        jax.random.key(1), spec.initial_pose(), scene, cfg, n_groups=4,
        trace_costs=True,
    )
    trace = np.asarray(trace)
    assert np.isfinite(trace).all()
    for c in range(3):
        want = float(cost_terms(states.pose[c], scene, CostMode.PARITY).total)
        np.testing.assert_allclose(float(states.total[c]), want, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(trace[c, -1], float(states.total[c]), rtol=1e-5)
    assert int(np.asarray(states.n_accept).min()) > 0


def test_incremental_rejects_fixed_mode():
    spec = demo_scene(4)
    with pytest.raises(ValueError, match="PARITY"):
        run_chains_incremental(
            jax.random.key(0), spec.initial_pose(), spec.build(),
            SamplerConfig(iterations=1, mode=CostMode.FIXED),
        )
