"""Checkpoint round-trip, metrics, and profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from mh_tpu.config import SamplerConfig
from mh_tpu.models.scene import demo_scene
from mh_tpu.sampler.mh import run_chain
from mh_tpu.utils.checkpoint import restore_state, save_state
from mh_tpu.utils.metrics import effective_sample_size, split_r_hat, summarize_chains
from mh_tpu.utils.profiling import PhaseTimer, force_completion


def test_checkpoint_roundtrip_and_deterministic_resume(tmp_path):
    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=30)
    mid, _ = run_chain(jax.random.key(0), spec.initial_pose(), scene, cfg)

    path = str(tmp_path / "ckpt")
    save_state(path, mid)
    restored = restore_state(path, mid)
    np.testing.assert_array_equal(np.asarray(restored.pose), np.asarray(mid.pose))
    assert int(restored.step) == int(mid.step)

    # resuming from the restored state continues bitwise-identically
    from mh_tpu.sampler.mh import mh_step

    def advance(s, n):
        for _ in range(n):
            s = jax.jit(mh_step, static_argnames="cfg")(s, scene, cfg)
        return s

    a = advance(mid, 5)
    b = advance(restored, 5)
    np.testing.assert_array_equal(np.asarray(a.pose), np.asarray(b.pose))


def test_ess_iid_near_t():
    x = jax.random.normal(jax.random.key(0), (512,))
    ess = float(effective_sample_size(x))
    assert 200 < ess <= 512 * 1.5


def test_ess_correlated_much_smaller():
    key = jax.random.key(1)
    noise = np.asarray(jax.random.normal(key, (512,)))
    x = np.zeros(512)
    for t in range(1, 512):
        x[t] = 0.95 * x[t - 1] + noise[t]
    ess = float(effective_sample_size(jnp.asarray(x)))
    assert ess < 150


def test_r_hat_mixed_vs_unmixed():
    key = jax.random.key(2)
    mixed = jax.random.normal(key, (4, 256))
    assert float(split_r_hat(mixed)) < 1.1
    shifted = mixed + jnp.arange(4)[:, None] * 10.0
    assert float(split_r_hat(shifted)) > 1.5


def test_summarize_chains():
    traces = jax.random.normal(jax.random.key(3), (4, 128))
    s = summarize_chains(traces)
    assert s["mean"].shape == (4,)
    assert float(s["r_hat"]) < 1.2


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        x = jnp.ones((8, 8)) * 2
        force_completion(x)
    assert "a" in t.report()
    assert t.counts["a"] == 1
