"""Geometry primitive tests vs the oracle (SURVEY.md C3)."""

import math

import numpy as np
import pytest

from mh_tpu.config import REF_PI, CostMode
from mh_tpu.models.scene import rects_from_vertices
from mh_tpu.ops import geometry as geo

import oracle


def test_distance():
    assert float(geo.distance(0.0, 0.0, 3.0, 4.0)) == pytest.approx(5.0)


@pytest.mark.parametrize("seed", range(4))
def test_theta_wrap(seed):
    rng = np.random.default_rng(seed)
    xi, yi, xj, yj = rng.uniform(-5, 5, 4)
    ti = rng.uniform(0, 2 * math.pi)
    # oracle: atan2 -> [0,2pi) -> minus ti -> [0,2pi)
    t = math.atan2(yi - yj, xi - xj)
    if t < 0:
        t += 2 * REF_PI
    t -= ti
    if t < 0:
        t += 2 * REF_PI
    got = float(geo.theta(xi, yi, xj, yj, ti, REF_PI))
    assert got == pytest.approx(t, abs=1e-5)


@pytest.mark.parametrize("parity", [True, False])
def test_aabb_matches_oracle(parity):
    rng = np.random.default_rng(3)
    quad = rng.uniform(-3, 3, size=(4, 2))
    tx, ty = 1.7, -0.9
    rs = rects_from_vertices(quad, [0])
    mode = CostMode.PARITY if parity else CostMode.FIXED
    mnx, mny, mxx, mxy = rs.aabb(np.float32(tx), np.float32(ty), mode)
    want = oracle.aabb(quad, tx, ty, parity)
    np.testing.assert_allclose(
        [float(mnx[0]), float(mny[0]), float(mxx[0]), float(mxy[0])],
        want,
        rtol=1e-5,
    )


def test_intersection_area_cases():
    # overlapping
    a = (0.0, 0.0, 2.0, 2.0)
    b = (1.0, 1.0, 3.0, 3.0)
    got = float(geo.intersection_area(*a, *b))
    assert got == pytest.approx(oracle.intersection_area(a, b)) == pytest.approx(1.0)
    # touching edges count as empty (strict >= in Kernel.cu:331)
    c = (2.0, 0.0, 4.0, 2.0)
    assert float(geo.intersection_area(*a, *c)) == 0.0
    # disjoint
    d = (5.0, 5.0, 6.0, 6.0)
    assert float(geo.intersection_area(*a, *d)) == 0.0


def test_outside_surface_area():
    surf = (0.0, 0.0, 10.0, 10.0)
    inside = (1.0, 1.0, 3.0, 3.0)
    assert float(geo.outside_surface_area(*inside, *surf)) == 0.0
    straddle = (-1.0, 2.0, 1.0, 4.0)  # 1x2 sticks out on the left
    got = float(geo.outside_surface_area(*straddle, *surf))
    assert got == pytest.approx(oracle.outside_area(straddle, surf)) == pytest.approx(2.0)
    outside = (12.0, 12.0, 14.0, 13.0)
    assert float(geo.outside_surface_area(*outside, *surf)) == pytest.approx(2.0)


def test_wrap_angle_once():
    assert float(geo.wrap_angle_once(np.float32(-0.5), REF_PI)) == pytest.approx(
        2 * REF_PI - 0.5
    )
    assert float(geo.wrap_angle_once(np.float32(2 * REF_PI + 0.25), REF_PI)) == (
        pytest.approx(0.25, abs=1e-6)
    )
    assert float(geo.wrap_angle_once(np.float32(1.0), REF_PI)) == pytest.approx(1.0)
