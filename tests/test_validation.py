"""Scene validation + checkify invariant tests."""

import jax
import numpy as np
import pytest
from jax.experimental import checkify

from mh_tpu.config import SamplerConfig
from mh_tpu.models.scene import demo_scene
from mh_tpu.sampler.mh import run_chain
from mh_tpu.utils.validation import check_state_finite, require_valid, validate_spec


def test_valid_demo_scene():
    assert validate_spec(demo_scene(8)) == []


def test_bad_relationship_index():
    spec = demo_scene(4)
    spec.relationships = [(0, 99, 1.0, 2.0)]
    errs = validate_spec(spec)
    assert any("out of range" in e for e in errs)
    with pytest.raises(ValueError, match="out of range"):
        require_valid(spec)


def test_all_frozen_flagged():
    spec = demo_scene(4)
    spec.frozen = np.ones(4, bool)
    assert any("frozen" in e for e in validate_spec(spec))


def test_nonfinite_positions_flagged():
    spec = demo_scene(4)
    spec.positions[0, 0] = np.nan
    assert any("non-finite" in e for e in validate_spec(spec))


def test_checkify_state_finite():
    spec = demo_scene(8)
    state, _ = run_chain(
        jax.random.key(0), spec.initial_pose(), spec.build(),
        SamplerConfig(iterations=10),
    )
    err, _ = checkify.checkify(check_state_finite)(state)
    err.throw()  # healthy state: no error

    import dataclasses

    import jax.numpy as jnp

    bad = dataclasses.replace(state, pose=state.pose.at[0, 0].set(jnp.nan))
    err, _ = checkify.checkify(check_state_finite)(bad)
    with pytest.raises(Exception, match="non-finite pose"):
        err.throw()
