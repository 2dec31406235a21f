"""Per-term parity tests: vectorized JAX costs vs the loop-based NumPy oracle.

Strategy per SURVEY.md §4(a): every cost term is checked against an
independent float64 oracle on randomized scenes, in both PARITY and FIXED
modes, and padding invariance is verified (masked padding must not change
any term).
"""

import numpy as np
import pytest

from mh_tpu.config import CostMode
from mh_tpu.models.scene import SceneSpec, demo_scene
from mh_tpu.ops import costs as C

import oracle


def random_spec(rng: np.random.Generator, n: int = 12, r: int = 5, c: int = 3) -> SceneSpec:
    def quad():
        return rng.uniform(-2.0, 2.0, size=(4, 2))

    pos = np.zeros((n, 6))
    pos[:, 0:2] = rng.uniform(0.0, 10.0, size=(n, 2))
    pos[:, 4] = rng.uniform(0.0, 2 * np.pi, size=n)
    rels = []
    for _ in range(r):
        lo, hi = np.sort(rng.uniform(0.5, 8.0, size=2))
        rels.append((int(rng.integers(n)), int(rng.integers(n)), float(lo), float(hi)))
    angs = []
    for _ in range(r):
        a, b = rng.uniform(0.0, 2 * np.pi, size=2)  # either order: both regimes
        angs.append((int(rng.integers(n)), int(rng.integers(n)), float(a), float(b)))
    clrs = [(quad(), int(rng.integers(n))) for _ in range(c)]
    return SceneSpec(
        positions=pos,
        sizes=rng.uniform(0.5, 3.0, size=(n, 2)),
        frozen=np.zeros(n, bool),
        offlimit_quads=np.stack([quad() for _ in range(n)]),
        surface_quad=np.array([[10.0, 10.0], [10.0, 0.0], [0.0, 0.0], [0.0, 10.0]]),
        centroid=(float(rng.uniform(-2, 2)), float(rng.uniform(-2, 2))),
        focal=(float(rng.uniform(0, 10)), float(rng.uniform(0, 10))),
        focal_rot=float(rng.uniform(0, 2 * np.pi)),
        w_pairwise=-2.0,
        w_visual_balance=1.5,
        w_focal=-2.0,
        w_symmetry=-2.0,
        w_clearance=-2.0,
        w_offlimits=-1.0,
        w_surface_area=-2.0,
        relationships=rels,
        angle_relationships=angs,
        clearances=clrs,
    )


MODES = [CostMode.PARITY, CostMode.FIXED]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("mode", MODES)
def test_terms_match_oracle(seed, mode):
    rng = np.random.default_rng(seed)
    spec = random_spec(rng)
    pose_np = np.asarray(spec.positions, np.float64)
    scene = spec.build()
    pose = spec.initial_pose()
    parity = mode is CostMode.PARITY

    checks = {
        "pair_wise_raw": (
            float(C.pair_wise_costs(pose, scene)),
            oracle.pair_wise(spec, pose_np),
        ),
        "pair_wise_angle_raw": (
            float(C.pair_wise_angle_costs(pose, scene, mode)),
            oracle.pair_wise_angle(spec, pose_np, parity),
        ),
        "visual_balance_raw": (
            float(C.visual_balance_costs(pose, scene)),
            oracle.visual_balance(spec, pose_np),
        ),
        "focal_raw": (
            float(C.focal_point_costs(pose, scene, mode)),
            oracle.focal_point(spec, pose_np, parity),
        ),
        "symmetry_raw": (
            float(C.symmetry_costs(pose, scene, mode)),
            oracle.symmetry(spec, pose_np, parity),
        ),
        "clearance_raw": (
            float(C.clearance_costs(pose, scene, mode)),
            oracle.clearance(spec, pose_np, parity),
        ),
        "off_limits_raw": (
            float(C.off_limits_costs(pose, scene, mode)),
            oracle.off_limits(spec, pose_np, parity),
        ),
        "surface_area_raw": (
            float(C.surface_area_costs(pose, scene, mode)),
            oracle.surface_area(spec, pose_np, parity),
        ),
    }
    for name, (got, want) in checks.items():
        np.testing.assert_allclose(
            got, want, rtol=2e-4, atol=2e-3, err_msg=f"{name} mode={mode}"
        )


@pytest.mark.parametrize("seed", [0, 5])
@pytest.mark.parametrize("mode", MODES)
def test_breakdown_matches_oracle(seed, mode):
    rng = np.random.default_rng(seed)
    spec = random_spec(rng)
    scene = spec.build()
    pose = spec.initial_pose()
    got = C.cost_terms(pose, scene, mode)
    want = oracle.breakdown(spec, np.asarray(spec.positions, np.float64),
                            parity=mode is CostMode.PARITY)
    for key, attr in [
        ("total", "total"),
        ("pair_wise", "pair_wise"),
        ("visual_balance", "visual_balance"),
        ("focal_point", "focal_point"),
        ("symmetry", "symmetry"),
        ("clearance", "clearance"),
        ("off_limits", "off_limits"),
        ("surface_area", "surface_area"),
    ]:
        np.testing.assert_allclose(
            float(getattr(got, attr)), want[key], rtol=5e-4, atol=5e-3,
            err_msg=f"{key} mode={mode}",
        )


@pytest.mark.parametrize("mode", MODES)
def test_padding_invariance(mode):
    """Masked padding must not change any cost term."""
    rng = np.random.default_rng(7)
    spec = random_spec(rng, n=9, r=4, c=2)
    tight = C.cost_terms(spec.initial_pose(), spec.build(), mode)
    padded_scene = spec.build(pad_objs=32, pad_rels=16, pad_clearances=8)
    padded = C.cost_terms(spec.initial_pose(pad_objs=32), padded_scene, mode)
    np.testing.assert_allclose(
        float(padded.total), float(tight.total), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(padded.as_vector()),
        np.asarray(tight.as_vector()),
        rtol=1e-5,
        atol=1e-4,
    )


def test_demo_scene_costs_finite():
    spec = demo_scene()
    got = C.cost_terms(spec.initial_pose(), spec.build(), CostMode.PARITY)
    vec = np.asarray(got.as_vector())
    assert np.all(np.isfinite(vec)), vec
    want = oracle.breakdown(spec, np.asarray(spec.positions, np.float64), parity=True)
    np.testing.assert_allclose(float(got.total), want["total"], rtol=5e-4, atol=5e-3)
