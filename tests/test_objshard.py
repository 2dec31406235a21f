"""Object-axis sharded cost evaluation vs the unsharded breakdown."""

import numpy as np
import pytest

from mh_tpu.config import CostMode
from mh_tpu.ops.costs import cost_terms
from mh_tpu.parallel.objshard import cost_terms_sharded, obj_mesh

from test_costs import random_spec


@pytest.mark.parametrize("mode", [CostMode.PARITY, CostMode.FIXED])
def test_sharded_costs_match_unsharded(mode):
    rng = np.random.default_rng(11)
    spec = random_spec(rng, n=13, r=4, c=3)
    scene = spec.build(pad_objs=16)  # 16 rows over 8 devices -> 2 rows each
    pose = spec.initial_pose(pad_objs=16)
    want = cost_terms(pose, scene, mode)
    got = cost_terms_sharded(pose, scene, obj_mesh(8), mode)
    for f in ("total", "pair_wise", "visual_balance", "focal_point",
              "symmetry", "clearance", "surface_area"):
        np.testing.assert_allclose(
            float(getattr(got, f)), float(getattr(want, f)),
            rtol=1e-5, atol=1e-4, err_msg=f,
        )
    if mode is CostMode.FIXED:
        np.testing.assert_allclose(
            float(got.off_limits), float(want.off_limits), rtol=1e-5, atol=1e-4
        )


def test_sharded_costs_bad_divisibility():
    rng = np.random.default_rng(1)
    spec = random_spec(rng, n=9)
    with pytest.raises(ValueError, match="divisible"):
        cost_terms_sharded(
            spec.initial_pose(), spec.build(), obj_mesh(8), CostMode.PARITY
        )
