"""Thin-engine (MH_FUSED_THIN) A/B against the wide per-chain layout.

The thin engine computes the step's per-chain scalar chains (proposal
params, rel+angle penalties, clearance outside-areas) with chains on the
LANE axis and moves results back with exact identity-MXU dots, so its
trajectories should be BITWISE equal to the wide layout: the counter RNG
stream maps (chain, draw-lane) to the same bits in either orientation
(``_uniform_sw(transposed=True)``), every elementwise op sees identical
inputs, and the only reductions (entity sums over one 8-sublane tile)
keep their shape. A flipped bit anywhere would flip an accept decision
and diverge the pose trajectory, so exact pose equality is a sharp test.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from mh_tpu.config import CostMode, SamplerConfig
from mh_tpu.kernels import fused_mh
from mh_tpu.models.scene import demo_scene


def _run(thin: str, mode: CostMode, n_objs=32, n_chains=8, iters=60,
         spec=None, **cfg_kw):
    prev = os.environ.get("MH_FUSED_THIN")
    os.environ["MH_FUSED_THIN"] = thin
    try:
        spec = spec if spec is not None else demo_scene(n_objs)
        scene = spec.build()
        cfg = SamplerConfig(mode=mode, **cfg_kw)
        pose, bd, acc, scale = fused_mh.run_chains_fused(
            0, spec.initial_pose(), scene, cfg, n_chains, iters,
            interpret=True,
        )
        return (np.asarray(pose), np.asarray(bd), np.asarray(acc),
                np.asarray(scale))
    finally:
        if prev is None:
            os.environ.pop("MH_FUSED_THIN", None)
        else:
            os.environ["MH_FUSED_THIN"] = prev


@pytest.mark.parametrize("mode", [CostMode.PARITY, CostMode.FIXED])
def test_thin_matches_wide_bitwise(mode):
    p1, b1, a1, _ = _run("1", mode)
    p0, b0, a0, _ = _run("0", mode)
    np.testing.assert_array_equal(a1, a0)
    np.testing.assert_array_equal(p1, p0)
    # breakdown terms tolerate reduction-order ulps (the final report's
    # thin partial sums ride a different tile orientation)
    np.testing.assert_allclose(b1, b0, rtol=1e-5, atol=1e-4)


def test_thin_matches_wide_offlimits_weighted():
    # a nonzero w_offlimits compiles the FIXED off-limits state machinery
    # in (track_off) — the demo scene's weight is 0 (the reference leaves
    # WeightOffLimits uninitialized), so without this spec the so-state
    # paths would go untested
    import dataclasses

    from mh_tpu.ops.costs import cost_terms

    spec = dataclasses.replace(demo_scene(32), w_offlimits=-1.5)
    p1, b1, a1, _ = _run("1", CostMode.FIXED, spec=spec)
    p0, b0, a0, _ = _run("0", CostMode.FIXED, spec=spec)
    np.testing.assert_array_equal(a1, a0)
    np.testing.assert_array_equal(p1, p0)
    np.testing.assert_allclose(b1, b0, rtol=1e-5, atol=1e-4)
    # the tracked off term must agree with the XLA objective on the
    # final poses (total incl. weighted off-limits)
    scene = spec.build()
    for c in range(2):
        ref = cost_terms(p1[c], scene, CostMode.FIXED)
        np.testing.assert_allclose(
            float(b1[c, 0]), float(ref.total), rtol=2e-4, atol=2e-3
        )


def test_fixed_zero_offweight_matches_tracked_totals():
    # skipping the so machinery at w_offlimits == 0 must be EXACT: totals
    # and trajectories equal a run that forces tracking via a tiny-weight
    # scene... the cleanest oracle is the XLA objective on final poses
    from mh_tpu.ops.costs import cost_terms

    p, b, _, _ = _run("1", CostMode.FIXED)
    scene = demo_scene(32).build()
    for c in range(2):
        ref = cost_terms(p[c], scene, CostMode.FIXED)
        np.testing.assert_allclose(
            float(b[c, 0]), float(ref.total), rtol=2e-4, atol=2e-3
        )


def test_thin_matches_wide_adapted():
    # adaptation exercises the t_row (column -> row) transpose of the
    # carried log-step-scale
    p1, _, a1, s1 = _run("1", CostMode.FIXED, adapt=True, adapt_rate=0.05)
    p0, _, a0, s0 = _run("0", CostMode.FIXED, adapt=True, adapt_rate=0.05)
    np.testing.assert_array_equal(a1, a0)
    np.testing.assert_array_equal(p1, p0)
    np.testing.assert_array_equal(s1, s0)


@pytest.mark.parametrize("mode", [CostMode.PARITY, CostMode.FIXED])
def test_thin_matches_wide_many_entities(mode):
    # > 8 relationships/angles and > CLR_UNROLL_MAX clearances pad the
    # entity sections to 16 rows and route clearances down the [w,Cp,N]
    # tile path — exercises the thin engine's multi-sublane-block row
    # slices of the transposed gather
    import dataclasses

    spec = demo_scene(24)
    rels = [(i, (i + 3) % 24, 2.0, 9.0) for i in range(10)]
    angs = [(i, (i + 5) % 24, 0.5, 2.5) for i in range(9)]
    clrs = list(spec.clearances) * 3  # 6 clearances > CLR_UNROLL_MAX
    spec = dataclasses.replace(
        spec, relationships=rels, angle_relationships=angs, clearances=clrs
    )
    outs = {}
    for thin in ("1", "0"):
        prev = os.environ.get("MH_FUSED_THIN")
        os.environ["MH_FUSED_THIN"] = thin
        try:
            scene = spec.build()
            cfg = SamplerConfig(mode=mode)
            pose, bd, acc, _ = fused_mh.run_chains_fused(
                0, spec.initial_pose(), scene, cfg, 8, 40, interpret=True
            )
            outs[thin] = (np.asarray(pose), np.asarray(acc), np.asarray(bd))
        finally:
            if prev is None:
                os.environ.pop("MH_FUSED_THIN", None)
            else:
                os.environ["MH_FUSED_THIN"] = prev
    np.testing.assert_array_equal(outs["1"][1], outs["0"][1])
    np.testing.assert_array_equal(outs["1"][0], outs["0"][0])
    np.testing.assert_allclose(outs["1"][2], outs["0"][2], rtol=1e-5,
                               atol=1e-4)


def test_slab_width_parity_invariant_bitwise():
    # slab maxima re-partition an order-insensitive max, so PARITY
    # trajectories must be bitwise W-invariant (MH_FUSED_SLABW A/B knob;
    # W=16 measured slower on TPU — this pins correctness, not speed)
    prev = os.environ.get("MH_FUSED_SLABW")
    try:
        os.environ["MH_FUSED_SLABW"] = "16"
        p16, _, a16, _ = _run("1", CostMode.PARITY, iters=40)
    finally:
        if prev is None:
            os.environ.pop("MH_FUSED_SLABW", None)
        else:
            os.environ["MH_FUSED_SLABW"] = prev
    p8, _, a8, _ = _run("1", CostMode.PARITY, iters=40)
    np.testing.assert_array_equal(a16, a8)
    np.testing.assert_array_equal(p16, p8)


def test_thin_accept_draws_block():
    # accept_draws > 1 reads draw rows 8..8+K of the transposed block
    p1, _, a1, _ = _run("1", CostMode.PARITY, accept_draws=16)
    p0, _, a0, _ = _run("0", CostMode.PARITY, accept_draws=16)
    np.testing.assert_array_equal(a1, a0)
    np.testing.assert_array_equal(p1, p0)
