"""Statistical validation of the NUTS sampler (sampler/nuts.py).

Same strategy as the HMC tests: moment-matching on analytic Gaussians,
robustness on the banana density, determinism, and divergence accounting.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mh_tpu.models.densities import banana, gaussian
from mh_tpu.sampler.nuts import nuts_sample


def test_nuts_gaussian_moments():
    target = gaussian(jnp.array([2.0, 0.0, -1.0]), jnp.array([1.0, 4.0, 0.5]))
    samples, final = nuts_sample(
        jax.random.key(0), target, jnp.zeros(3), n_samples=600,
        n_warmup=200, max_depth=6, n_chains=4,
    )
    s = np.asarray(samples)[:, 100:, :].reshape(-1, 3)
    np.testing.assert_allclose(s.mean(0), [2.0, 0.0, -1.0], atol=0.25)
    np.testing.assert_allclose(s.var(0), [1.0, 4.0, 0.5], rtol=0.35)
    assert np.asarray(final.n_divergent).max() == 0


def test_nuts_correlated_gaussian_explores():
    # anisotropic target: NUTS's adaptive trajectory length must cover the
    # long axis — a fixed-1-step sampler would mix far slower
    target = gaussian(jnp.zeros(2), jnp.array([100.0, 0.01]))
    samples, final = nuts_sample(
        jax.random.key(1), target, jnp.zeros(2), n_samples=500,
        n_warmup=300, max_depth=8, n_chains=4,
    )
    s = np.asarray(samples)[:, 100:, :].reshape(-1, 2)
    np.testing.assert_allclose(s.var(0), [100.0, 0.01], rtol=0.5)
    # the step size adapts to the stiff axis, so deep trees must occur
    mean_depth = np.asarray(final.sum_depth).mean() / 500
    assert mean_depth > 2.0


def test_nuts_banana_finite():
    samples, final = nuts_sample(
        jax.random.key(2), banana(), jnp.zeros(2), n_samples=300,
        n_warmup=150, max_depth=6, n_chains=2,
    )
    assert np.isfinite(np.asarray(samples)).all()


def test_nuts_deterministic_replay():
    target = gaussian(jnp.zeros(2), jnp.ones(2))
    s1, _ = nuts_sample(jax.random.key(7), target, jnp.zeros(2), n_samples=50,
                        n_warmup=50, max_depth=5, n_chains=2)
    s2, _ = nuts_sample(jax.random.key(7), target, jnp.zeros(2), n_samples=50,
                        n_warmup=50, max_depth=5, n_chains=2)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
