"""Straight-Python/NumPy oracle of the reference objective math.

An *independent*, loop-based float64 implementation of every cost term as
specified in SURVEY.md §2.3 (citing ``Kernel.cu`` line ranges), used as the
golden model for the vectorized JAX implementation. Deliberately written
with explicit per-object loops in reference evaluation order — including the
parity quirks — so agreement is strong evidence of behavioral parity.
"""

from __future__ import annotations

import math

import numpy as np

from mh_tpu.models.scene import SceneSpec

REF_PI = 3.1416  # Kernel.cu:31


def _pi(parity: bool) -> float:
    return REF_PI if parity else math.pi


def aabb(quad: np.ndarray, tx: float, ty: float, parity: bool):
    """AABB of a 4-vertex quad translated by (tx, ty).

    Parity reproduces ``minValue``'s missing translation on the first
    x-candidate (``Kernel.cu:371``): the running min starts at DBL_MAX, the
    first comparison always wins and assigns the *untranslated* x.
    """
    xs = [float(v[0]) for v in quad]
    ys = [float(v[1]) for v in quad]
    if parity:
        mnx = min(xs[0], xs[1] + tx, xs[2] + tx, xs[3] + tx)
    else:
        mnx = min(x + tx for x in xs)
    mny = min(y + ty for y in ys)
    mxx = max(x + tx for x in xs)
    mxy = max(y + ty for y in ys)
    return mnx, mny, mxx, mxy


def intersection_area(a, b) -> float:
    """``calculateIntersectionArea`` (``Kernel.cu:321-340``)."""
    x5 = max(a[0], b[0])
    y5 = max(a[1], b[1])
    x6 = min(a[2], b[2])
    y6 = min(a[3], b[3])
    if x5 >= x6 or y5 >= y6:
        return 0.0
    return (x6 - x5) * (y6 - y5)


def outside_area(rect, surf) -> float:
    """Sum of intersections with the 4 complement rects (``Kernel.cu:343-364``)."""
    big = 1e30
    smnx, smny, smxx, smxy = surf
    comps = [
        (-big, -big, big, smny),
        (-big, smny, smnx, smxy),
        (-big, smxy, big, big),
        (smxx, smny, big, smxy),
    ]
    return sum(intersection_area(rect, c) for c in comps)


def pair_wise(spec: SceneSpec, pose: np.ndarray) -> float:
    """``PairWiseCosts`` (``Kernel.cu:210-233``)."""
    out = 0.0
    for (s, t, lo, hi) in spec.relationships:
        d = math.hypot(pose[s, 0] - pose[t, 0], pose[s, 1] - pose[t, 1])
        if d < lo:
            out -= (d / lo) ** 2
        elif d > hi:
            out -= (hi / d) ** 2
    return out


def pair_wise_angle(spec: SceneSpec, pose: np.ndarray, parity: bool) -> float:
    """``PairWiseAngleCosts`` (``Kernel.cu:236-263``)."""
    pi = _pi(parity)
    out = 0.0
    for (s, t, amin, amax) in spec.angle_relationships:
        th = math.atan2(pose[s, 1] - pose[t, 1], pose[s, 0] - pose[t, 0])
        if th < 0:
            th = 2 * pi + th
        th -= pose[t, 4]
        if th < 0:
            th = 2 * pi + th
        if amin > amax:
            norm = (2 * pi - (amax + (2 * pi - amin))) / 2.0
            if math.fmod(amin + th, 2 * pi) > amax:
                out -= min(abs(th - amin), abs(th - amax)) / norm
        else:
            if parity:
                cond = amin < th or th < amax  # Kernel.cu:251 — quirky OR
            else:
                cond = th < amin or th > amax
            if cond:
                norm = (2 * pi - (amax - amin)) / 2.0
                out -= min(abs(th - amin), abs(th - amax)) / norm
    return out


def visual_balance(spec: SceneSpec, pose: np.ndarray) -> float:
    """``VisualBalanceCosts`` (``Kernel.cu:191-207``)."""
    nx = ny = denom = 0.0
    for i in range(spec.n_objs):
        area = float(spec.sizes[i, 0]) * float(spec.sizes[i, 1])
        nx += area * pose[i, 0]
        ny += area * pose[i, 1]
        denom += area
    return -math.hypot(
        nx / denom - spec.centroid[0] / 2.0, ny / denom - spec.centroid[1] / 2.0
    )


def focal_point(spec: SceneSpec, pose: np.ndarray, parity: bool) -> float:
    """``FocalPointCosts`` (``Kernel.cu:266-281``)."""
    pi = _pi(parity)
    out = 0.0
    for i in range(spec.n_objs):
        ph = (
            math.atan2(spec.focal[1] - pose[i, 1], spec.focal[0] - pose[i, 0])
            - pose[i, 4]
            + pi / 2.0
        )
        out -= math.cos(ph)
    return out


def symmetry(spec: SceneSpec, pose: np.ndarray, parity: bool) -> float:
    """``SymmetryCosts`` (``Kernel.cu:283-318``)."""
    pi = _pi(parity)
    ux = math.cos(spec.focal_rot)
    uy = math.sin(spec.focal_rot)
    out = 0.0
    for i in range(spec.n_objs):
        s = 2.0 * (
            spec.focal[0] * ux
            + spec.focal[1] * uy
            - (pose[i, 0] * ux + pose[i, 1] * uy)
        )
        rx = pose[i, 0] + s * ux
        ry = pose[i, 1] + s * uy
        rrot = 2.0 * spec.focal_rot - pose[i, 4]
        if rrot < -pi:
            rrot += 2 * pi
        best = 0.0
        for j in range(spec.n_objs):
            dp = math.hypot(pose[j, 0] - rx, pose[j, 1] - ry)
            dt = pose[j, 4] - rrot
            if dt > pi:
                dt -= 2 * pi
            best = max(best, 5.0 - math.sqrt(dp) - 0.4 * abs(dt))
        out -= best
    return out


def clearance(spec: SceneSpec, pose: np.ndarray, parity: bool) -> float:
    """``ClearanceCosts`` (``Kernel.cu:404-434``)."""
    out = 0.0
    for (quad, src) in spec.clearances:
        r1 = aabb(quad, pose[src, 0], pose[src, 1], parity)
        for j in range(spec.n_objs):
            r2 = aabb(spec.offlimit_quads[j], pose[j, 0], pose[j, 1], parity)
            out -= intersection_area(r1, r2)
    return out


def off_limits(spec: SceneSpec, pose: np.ndarray, parity: bool) -> float:
    """``OffLimitsCosts`` (``Kernel.cu:485-514``)."""
    out = 0.0
    for i in range(spec.n_objs):
        r1 = aabb(spec.offlimit_quads[i], pose[i, 0], pose[i, 1], parity)
        for j in range(i + 1, spec.n_objs):
            r2 = aabb(spec.offlimit_quads[j], pose[j, 0], pose[j, 1], parity)
            out -= intersection_area(r1, r2)
    return out


def surface_area(spec: SceneSpec, pose: np.ndarray, parity: bool) -> float:
    """``SurfaceAreaCosts`` (``Kernel.cu:437-483``).

    Parity: clearance rect i is translated by object *i* (loop index,
    ``Kernel.cu:456``); fixed: by its SourceIndex.
    """
    surf = aabb(spec.surface_quad, 0.0, 0.0, parity)
    out = 0.0
    for i, (quad, src) in enumerate(spec.clearances):
        t = i if parity else src
        r1 = aabb(quad, pose[t, 0], pose[t, 1], parity)
        out -= outside_area(r1, surf)
    for j in range(spec.n_objs):
        r1 = aabb(spec.offlimit_quads[j], pose[j, 0], pose[j, 1], parity)
        out -= outside_area(r1, surf)
    return out


def breakdown(spec: SceneSpec, pose: np.ndarray, parity: bool = True) -> dict:
    """Weighted breakdown + total (``Costs``, ``Kernel.cu:516-550``)."""
    pw = pair_wise(spec, pose)
    pwa = pair_wise_angle(spec, pose, parity)
    pair = spec.w_pairwise * (pw * pwa if parity else pw + pwa)
    vb = spec.w_visual_balance * visual_balance(spec, pose)
    fp = spec.w_focal * focal_point(spec, pose, parity)
    sym = spec.w_symmetry * symmetry(spec, pose, parity)
    off = spec.w_offlimits * off_limits(spec, pose, parity)
    clr = spec.w_clearance * clearance(spec, pose, parity)
    sa = spec.w_surface_area * surface_area(spec, pose, parity)
    total = pair + vb + fp + sym + clr + sa
    if not parity:
        total += off
    return {
        "total": total,
        "pair_wise": pair,
        "visual_balance": vb,
        "focal_point": fp,
        "symmetry": sym,
        "clearance": clr,
        "off_limits": off,
        "surface_area": sa,
    }
