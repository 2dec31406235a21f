"""Statistical validation of generic-density samplers: RW-MH, HMC, VI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mh_tpu.config import SamplerConfig
from mh_tpu.models.densities import banana, gaussian
from mh_tpu.models.scene import demo_scene
from mh_tpu.sampler.generic import (
    layout_logdensity,
    pose_from_theta,
    rw_metropolis,
    theta_from_pose,
)
from mh_tpu.sampler.hmc import hmc_sample
from mh_tpu.sampler.vi import meanfield_vi


def test_rw_metropolis_gaussian_moments():
    target = gaussian(jnp.array([1.0, -2.0]), jnp.array([1.0, 0.25]))
    samples, final = rw_metropolis(
        jax.random.key(0), target, jnp.zeros(2), n_samples=2000,
        n_chains=8, step_size=0.8, thin=2,
    )
    s = np.asarray(samples)[:, 500:, :].reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), [1.0, -2.0], atol=0.15)
    np.testing.assert_allclose(s.var(0), [1.0, 0.25], rtol=0.3)


def test_hmc_gaussian_moments():
    target = gaussian(jnp.array([2.0, 0.0, -1.0]), jnp.array([1.0, 4.0, 0.5]))
    samples, final = hmc_sample(
        jax.random.key(1), target, jnp.zeros(3), n_samples=800,
        n_warmup=200, n_leapfrog=8, n_chains=4,
    )
    rate = np.asarray(final.n_accept) / 800
    assert rate.mean() > 0.5  # adapted step size keeps acceptance healthy
    s = np.asarray(samples)[:, 200:, :].reshape(-1, 3)
    np.testing.assert_allclose(s.mean(0), [2.0, 0.0, -1.0], atol=0.25)
    np.testing.assert_allclose(s.var(0), [1.0, 4.0, 0.5], rtol=0.35)


def test_hmc_banana_runs():
    samples, final = hmc_sample(
        jax.random.key(2), banana(), jnp.zeros(2), n_samples=300,
        n_warmup=150, n_leapfrog=16, n_chains=2,
    )
    assert np.isfinite(np.asarray(samples)).all()
    assert np.asarray(final.n_accept).min() > 30


def test_vi_gaussian_recovers_params():
    target = gaussian(jnp.array([3.0, -1.0]), jnp.array([0.5, 2.0]))
    mu, sigma, trace = meanfield_vi(
        jax.random.key(3), target, jnp.zeros(2), n_steps=800, n_mc=16,
        learning_rate=0.05,
    )
    np.testing.assert_allclose(np.asarray(mu), [3.0, -1.0], atol=0.2)
    np.testing.assert_allclose(np.asarray(sigma), np.sqrt([0.5, 2.0]), rtol=0.3)
    # ELBO improves over training
    t = np.asarray(trace)
    assert t[-50:].mean() > t[:50].mean()


def test_layout_logdensity_roundtrip_and_hmc():
    spec = demo_scene(8)
    scene = spec.build()
    pose0 = spec.initial_pose()
    theta0 = theta_from_pose(pose0)
    np.testing.assert_allclose(
        np.asarray(pose_from_theta(theta0, pose0, scene)), np.asarray(pose0)
    )
    target = layout_logdensity(scene, pose0, beta=2.0)
    lp0 = float(target(theta0))
    assert np.isfinite(lp0)

    samples, final = hmc_sample(
        jax.random.key(4), target, theta0, n_samples=50, n_warmup=50,
        n_leapfrog=5, n_chains=2,
    )
    assert np.isfinite(np.asarray(samples)).all()
    # HMC should find higher-scoring configurations than the start
    lp_end = float(np.asarray(final.logprob).max())
    assert lp_end >= lp0


def test_frozen_objects_fixed_under_theta():
    spec = demo_scene(6)
    frozen = np.zeros(6, bool)
    frozen[2] = True
    spec.frozen = frozen
    scene = spec.build()
    pose0 = spec.initial_pose()
    theta = theta_from_pose(pose0) + 100.0
    pose = np.asarray(pose_from_theta(theta, pose0, scene))
    np.testing.assert_allclose(pose[2], np.asarray(pose0)[2])  # frozen held
    assert pose[0, 0] == pytest.approx(np.asarray(pose0)[0, 0] + 100.0)


def test_mala_gaussian_moments():
    from mh_tpu.sampler.mala import mala_sample

    target = gaussian(jnp.array([1.5, -0.5]), jnp.array([1.0, 0.25]))
    samples, final = mala_sample(
        jax.random.key(6), target, jnp.zeros(2), n_samples=2500,
        n_chains=8, step_size=0.45, thin=2,
    )
    rate = np.asarray(final.n_accept) / 5000
    assert 0.3 < rate.mean() < 0.95, rate
    s = np.asarray(samples)[:, 500:, :].reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), [1.5, -0.5], atol=0.15)
    np.testing.assert_allclose(s.var(0), [1.0, 0.25], rtol=0.3)


def test_mala_asymmetric_correction_matters():
    """With the Langevin drift, the asymmetric-proposal term is required
    for exact invariance: the acceptance ratio must not be the plain MH
    ratio. Check a skewed target's tail mass comes out right (an
    uncorrected ULA chain at this step size visibly over-contracts)."""
    from mh_tpu.sampler.mala import mala_sample

    target = gaussian(jnp.array([0.0]), jnp.array([1.0]))
    samples, _ = mala_sample(
        jax.random.key(8), target, jnp.zeros(1), n_samples=4000,
        n_chains=8, step_size=1.2,
    )
    s = np.asarray(samples)[:, 1000:, 0].ravel()
    # ULA at eps=1.2 has stationary var eps^2-biased (~ 1/(1-eps^2/4) form);
    # MALA must recover var 1 within MC error
    assert abs(s.var() - 1.0) < 0.08, s.var()
    assert abs(s.mean()) < 0.05


def test_mala_improves_layout_score():
    from mh_tpu.sampler.mala import mala_sample

    spec = demo_scene(8)
    scene = spec.build()
    pose0 = spec.initial_pose()
    target = layout_logdensity(scene, pose0, beta=2.0)
    theta0 = theta_from_pose(pose0)
    lp0 = float(target(theta0))
    samples, final = mala_sample(
        jax.random.key(9), target, theta0, n_samples=150,
        n_chains=2, step_size=0.05,
    )
    assert np.isfinite(np.asarray(samples)).all()
    assert float(np.asarray(final.logprob).max()) >= lp0
