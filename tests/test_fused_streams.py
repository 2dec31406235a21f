"""MH_FUSED_STREAMS must not change trajectories (bitwise).

The interleaved-streams path slices the chain block into independent
row groups whose step op-chains interleave for ILP
(``kernels/fused_mh.py``). Every step op is elementwise along the chain
axis and the RNG block is drawn full-width, so any stream count must
reproduce the G=1 trajectories exactly — this is the same class of
invariant as device-count invariance (chains must not depend on how they
are batched onto hardware).
"""

import os

import numpy as np
import pytest

from mh_tpu.config import SamplerConfig
from mh_tpu.models.scene import demo_scene


@pytest.fixture
def _clean_streams_env():
    old = os.environ.pop("MH_FUSED_STREAMS", None)
    yield
    if old is None:
        os.environ.pop("MH_FUSED_STREAMS", None)
    else:
        os.environ["MH_FUSED_STREAMS"] = old


@pytest.mark.slow
def test_streams_bitwise_invariant(_clean_streams_env):
    import jax

    from mh_tpu.kernels.fused_mh import run_chains_fused

    spec = demo_scene(24)
    scene = spec.build()
    pose0 = spec.initial_pose()
    cfg = SamplerConfig()

    def run():
        return run_chains_fused(
            0, pose0, scene, cfg, 32, 24, interpret=True
        )

    base = run()
    # 3 does not divide the 32-chain block: the knob must fall back to a
    # valid stream count (halving), not crash or change results
    for g in (2, 4, 3):
        os.environ["MH_FUSED_STREAMS"] = str(g)
        got = run()
        for a, b in zip(
            jax.tree_util.tree_leaves(base), jax.tree_util.tree_leaves(got)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
