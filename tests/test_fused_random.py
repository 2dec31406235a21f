"""Fused kernel on RANDOMIZED scenes (interpret mode, CPU).

The other fused tests anchor on demo-scene variants; these sweep random
geometry, relationships in both angle regimes, clearances, and a nonzero
off-limits weight (tracked FIXED state) through the full kernel — thin
and wide layouts must stay bitwise-equal, and the reported totals must
agree with the XLA objective on the final poses.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from mh_tpu.config import CostMode, SamplerConfig
from mh_tpu.kernels import fused_mh
from mh_tpu.models.scene import demo_scene  # noqa: F401 (parity of imports)
from mh_tpu.ops.costs import cost_terms
from test_costs import random_spec


def _run_fused(spec, mode, thin, iters=50, n_chains=8):
    prev = os.environ.get("MH_FUSED_THIN")
    os.environ["MH_FUSED_THIN"] = thin
    try:
        scene = spec.build()
        pose, bd, acc, _ = fused_mh.run_chains_fused(
            0, spec.initial_pose(), scene, SamplerConfig(mode=mode),
            n_chains, iters, interpret=True,
        )
        return np.asarray(pose), np.asarray(bd), np.asarray(acc)
    finally:
        if prev is None:
            os.environ.pop("MH_FUSED_THIN", None)
        else:
            os.environ["MH_FUSED_THIN"] = prev


@pytest.mark.parametrize("seed", [11, 23])
@pytest.mark.parametrize("mode", [CostMode.PARITY, CostMode.FIXED])
def test_fused_random_scene_totals_and_thin_equality(seed, mode):
    spec = random_spec(np.random.default_rng(seed))
    p1, b1, a1 = _run_fused(spec, mode, "1")
    p0, b0, a0 = _run_fused(spec, mode, "0")
    np.testing.assert_array_equal(a1, a0)
    np.testing.assert_array_equal(p1, p0)
    np.testing.assert_allclose(b1, b0, rtol=1e-4, atol=1e-3)

    assert not np.isnan(p1).any()
    scene = spec.build()
    for c in range(p1.shape[0]):
        ref = cost_terms(p1[c], scene, mode)
        np.testing.assert_allclose(
            float(b1[c, 0]), float(ref.total), rtol=5e-4, atol=5e-3
        )
