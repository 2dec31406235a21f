"""Headline-shape hardware gates (TPU only).

The round-2 regression: the fused kernel's default block needed 18.85 MB of
scoped VMEM against its 17 MB limit at the BASELINE headline shape
(100 objects / 1024 chains), the compile aborted, and the benchmark shipped
no number — because every hardware kernel test used 16-48-object scenes.
These tests pin the exact bench configuration (the always-running default
harness of the reference, ``Kernel.cu:1003-1218``) on the real chip:

  MH_TPU_TEST_PLATFORM=axon python -m pytest tests/test_headline_tpu.py
"""

import warnings

import jax
import numpy as np
import pytest

from mh_tpu.config import SamplerConfig
from mh_tpu.models.scene import demo_scene

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="headline-shape gates run on TPU hardware only",
)

N_OBJS, N_CHAINS = 100, 1024  # BASELINE.md config 3/4


def test_fused_default_knobs_serve_headline_shape():
    """Default block/VMEM selection must compile first try at the bench
    shape — a scoped-VMEM retry (warning) means fused_vmem_estimate is
    mis-calibrated and the first user call eats a failed multi-minute
    compile."""
    from mh_tpu.kernels.fused_mh import run_chains_fused

    spec = demo_scene(N_OBJS)
    scene = spec.build()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pose, bd, n_acc, _ = run_chains_fused(
            0, spec.initial_pose(), scene, SamplerConfig(), N_CHAINS, 10
        )
        pose = np.asarray(pose)
    oom_retries = [w for w in caught if "VMEM OOM" in str(w.message)]
    assert not oom_retries, f"estimate mis-sized the block: {oom_retries}"
    assert pose.shape == (N_CHAINS, scene.n_pad_objs, 6)
    assert not np.isnan(pose).any()
    acc = np.asarray(n_acc)
    assert 0 < acc.mean() <= 10


def test_suggest_layouts_fused_headline():
    """The public API path that crashed in round 2: engine='fused' (and the
    auto choice above the crossover) at a 100-object scene."""
    from mh_tpu.api import suggest_layouts

    spec = demo_scene(N_OBJS)
    cfg = SamplerConfig(iterations=20, n_chains=N_CHAINS)
    res = suggest_layouts(spec, cfg, engine="fused")
    assert res.points.shape[0] == N_CHAINS
    assert np.isfinite(res.costs).all()
    assert 0.0 < float(np.mean(res.accept_rate)) <= 1.0


def test_fused_posterior_statistics_match_xla_headline():
    """Fused vs XLA posterior moments at the headline scene size (the two
    engines use different random streams but sample the same target), plus
    the in-kernel accept counters against the XLA engine's accept rate."""
    from mh_tpu.kernels.fused_mh import run_chains_fused
    from mh_tpu.sampler.mh import run_chains

    iters = 300
    spec = demo_scene(N_OBJS)
    scene = spec.build()
    cfg = SamplerConfig(iterations=iters, n_chains=N_CHAINS)

    pose_f, bd_f, acc_f, _ = run_chains_fused(
        7, spec.initial_pose(), scene, cfg, N_CHAINS, iters
    )
    states, _ = run_chains(jax.random.key(7), spec.initial_pose(), scene, cfg)

    tot_f = np.asarray(bd_f[:, 0], np.float64)
    tot_x = np.asarray(states.costs.total, np.float64)
    # same target, same iteration count: chain-averaged total cost and its
    # spread agree within a few percent of the spread
    se = tot_x.std() / np.sqrt(N_CHAINS)
    assert abs(tot_f.mean() - tot_x.mean()) < 6 * se * np.sqrt(2)
    assert 0.5 < tot_f.std() / tot_x.std() < 2.0

    rate_f = np.asarray(acc_f, np.float64).mean() / iters
    rate_x = float(np.mean(np.asarray(states.accept_rate)))
    assert abs(rate_f - rate_x) < 0.05
