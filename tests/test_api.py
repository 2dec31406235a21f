"""End-to-end API test: the KernelWrapper-equivalent surface (SURVEY.md C9).

Runs the reference demo scene (``Kernel.cu:1003-1194``) through
``suggest_layouts`` and cross-checks the returned cost breakdowns against
the NumPy oracle evaluated on the returned poses — proving the breakdowns
are real (the reference returns garbage here, ``Kernel.cu:852-861``).
"""

import numpy as np

from mh_tpu.api import suggest_layouts
from mh_tpu.config import SamplerConfig
from mh_tpu.models.scene import demo_scene

import oracle


def test_suggest_layouts_demo_scene():
    spec = demo_scene(32)
    cfg = SamplerConfig(iterations=100, n_chains=4)
    res = suggest_layouts(spec, cfg, key=0)

    assert res.points.shape == (4, 32, 6)
    assert res.costs.shape == (4, 8)
    assert np.isfinite(res.points).all()
    assert np.isfinite(res.costs).all()
    assert np.all(res.accept_rate > 0)

    # Cost breakdowns must be *real*: re-evaluate each returned pose with the
    # float64 oracle and compare every component.
    for c in range(4):
        pose = np.zeros((32, 6))
        pose[:, :] = res.points[c]
        want = oracle.breakdown(spec, pose, parity=True)
        got = dict(zip(type(res).COST_FIELDS, res.costs[c]))
        for k in type(res).COST_FIELDS:
            np.testing.assert_allclose(
                got[k], want[k], rtol=1e-3, atol=5e-3, err_msg=f"chain {c} {k}"
            )

    # NOTE: no on-surface assertion — like the reference harness, initial
    # poses start far off the 10x10 surface (objects at (2i, 2i)); only
    # translated objects get clamped (Kernel.cu:613-630), the rest are merely
    # penalized by the surface-area term.


def test_unknown_engine_rejected():
    import pytest
    from mh_tpu.config import SamplerConfig

    with pytest.raises(ValueError, match="unknown engine"):
        suggest_layouts(
            demo_scene(4), SamplerConfig(iterations=1, n_chains=8),
            engine="cuda",
        )


def test_fused_engine_handles_every_config():
    """engine='fused' accepts a chains mesh (round 2: shard_map'd kernel;
    off-TPU it runs the Pallas interpreter with the software PRNG), and
    adaptation + block proposals are supported in-kernel — auto therefore
    handles every sampler config on any platform."""
    from mh_tpu.api import suggest_layouts
    from mh_tpu.config import SamplerConfig
    from mh_tpu.models.scene import demo_scene
    from mh_tpu.parallel.mesh import chain_mesh

    spec = demo_scene(8)
    cfg = SamplerConfig(iterations=2, n_chains=8, adapt=True)
    res = suggest_layouts(spec, cfg, key=0, engine="fused", mesh=chain_mesh())
    assert res.points.shape[0] == 8
    assert np.isfinite(res.points).all()
    assert np.isfinite(res.costs).all()
    # auto handles adaptive + block-proposal configs on any platform
    for ok in (
        cfg,
        SamplerConfig(iterations=2, n_chains=8, n_moves_per_step=4),
    ):
        res = suggest_layouts(spec, ok, key=0, engine="auto")
        assert res.points.shape[0] == 8


def test_suggest_layouts_mesh_sharding_invariant():
    """suggest_layouts shards chains over a mesh with bitwise-identical
    results to the single-device path (keys fold from global chain ids),
    and guards the unsupported combinations."""
    import pytest

    from mh_tpu.api import suggest_layouts
    from mh_tpu.config import SamplerConfig
    from mh_tpu.models.scene import demo_scene
    from mh_tpu.parallel.mesh import chain_mesh

    spec = demo_scene(8)
    cfg = SamplerConfig(iterations=20, n_chains=16)
    r1 = suggest_layouts(spec, cfg, key=3, mesh=chain_mesh(1))
    r8 = suggest_layouts(spec, cfg, key=3, mesh=chain_mesh(8))
    np.testing.assert_array_equal(r1.points, r8.points)
    np.testing.assert_array_equal(r1.costs, r8.costs)
    np.testing.assert_array_equal(r1.accept_rate, r8.accept_rate)

    with pytest.raises(ValueError, match="mesh"):
        suggest_layouts(spec, cfg, key=3, engine="xla_specialized",
                        mesh=chain_mesh(8))
    per_chain_pose0 = np.repeat(
        np.asarray(spec.initial_pose())[None], 16, axis=0
    )
    with pytest.raises(ValueError, match="pose0"):
        suggest_layouts(spec, cfg, key=3, pose0=per_chain_pose0,
                        mesh=chain_mesh(8))


def test_suggest_layouts_objsharded_huge_scene():
    """Huge-scene model parallelism is reachable from the public API: a
    2048-object scene sampled via objs_devices= (2-D chains x objs mesh)
    without importing mh_tpu.parallel.objshard directly, matching the
    library-level path bitwise."""
    import pytest

    from mh_tpu.parallel.objshard import chain_obj_mesh

    spec = demo_scene(2048)
    cfg = SamplerConfig(iterations=3, n_chains=2)
    res = suggest_layouts(spec, cfg, key=1, objs_devices=4)
    assert res.points.shape == (2, 2048, 6)
    assert np.isfinite(res.points).all()
    assert np.isfinite(res.costs).all()

    # explicit 2-D mesh dispatch, same results (proposals keyed from global
    # chain ids — objs-axis split cannot change the stream)
    res2 = suggest_layouts(spec, cfg, key=1, mesh=chain_obj_mesh(2, 2))
    np.testing.assert_array_equal(res.points, res2.points)

    with pytest.raises(ValueError, match="XLA engine"):
        suggest_layouts(spec, cfg, key=1, objs_devices=4, engine="fused")
    with pytest.raises(ValueError, match="divide"):
        suggest_layouts(spec, cfg, key=1, objs_devices=3)


def test_auto_engine_dispatch_table():
    """Pin the auto-engine decision across {1, >1} devices x {one-shot,
    serve} (docs/API.md "Auto dispatch" table)."""
    from mh_tpu.api import FUSED_CROSSOVER, SERVE_CROSSOVER, auto_engine

    base = dict(on_tpu=True, serve=False, n_chains=1024, n_dev=1,
                explicit_mesh=False, shared_pose0=True)

    # single device, one-shot: scan below the fused crossover, fused above
    assert auto_engine(**{**base, "n_pad_objs": FUSED_CROSSOVER}) == "xla"
    assert auto_engine(**{**base, "n_pad_objs": FUSED_CROSSOVER + 1}) == "fused"
    # single device, serving: specialized below its crossover, fused above
    assert auto_engine(
        **{**base, "serve": True, "n_pad_objs": SERVE_CROSSOVER}
    ) == "xla_specialized"
    assert auto_engine(
        **{**base, "serve": True, "n_pad_objs": SERVE_CROSSOVER + 1}
    ) == "fused"
    # multi-device: fused stays available via the sharded kernel (chains
    # split evenly, one shared pose0) — the round-2 auto served the slow
    # generic scan on any pod
    multi = {**base, "n_dev": 8, "n_pad_objs": 256}
    assert auto_engine(**multi) == "fused"
    assert auto_engine(**{**multi, "serve": True}) == "fused"
    # chains that don't split, or per-chain starts: generic scan
    assert auto_engine(**{**multi, "n_chains": 1023}) == "xla"
    assert auto_engine(**{**multi, "shared_pose0": False}) == "xla"
    # off-TPU there is no fused kernel
    assert auto_engine(**{**base, "on_tpu": False, "n_pad_objs": 512}) == "xla"


def test_auto_fused_failure_falls_back_to_xla(monkeypatch):
    """An auto-selected fused engine that fails (e.g. a compile error the
    in-kernel retry could not fix) must degrade to the XLA engine with a
    warning — the round-2 bench died because this path crashed instead."""
    import warnings

    import mh_tpu.api as api

    def boom(*a, **k):
        raise RuntimeError("synthetic fused failure")

    monkeypatch.setattr(api, "_run_fused", boom)
    monkeypatch.setattr(
        api, "auto_engine", lambda **kw: "fused"
    )
    spec = demo_scene(8)
    cfg = SamplerConfig(iterations=2, n_chains=8)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        res = api.suggest_layouts(spec, cfg, key=0, engine="auto")
    assert res.points.shape[0] == 8
    assert any("falling back" in str(w.message) for w in caught)

    # an EXPLICIT engine="fused" propagates the failure instead
    import pytest

    with pytest.raises(RuntimeError, match="synthetic"):
        api.suggest_layouts(spec, cfg, key=0, engine="fused")
