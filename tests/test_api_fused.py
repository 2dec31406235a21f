"""suggest_layouts(engine='fused') end-to-end (TPU hardware only)."""

import jax
import numpy as np
import pytest

from mh_tpu import SamplerConfig, demo_scene, suggest_layouts

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="fused engine needs TPU PRNG primitives",
)


def test_fused_engine_via_api():
    res = suggest_layouts(
        demo_scene(32), SamplerConfig(iterations=50, n_chains=8),
        key=0, engine="fused",
    )
    assert res.points.shape == (8, 32, 6)
    assert res.costs.shape == (8, 8)
    assert np.isfinite(res.costs).all()
    assert np.all(res.accept_rate > 0.1)


