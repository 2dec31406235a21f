"""Standard target densities for sampler validation and benchmarking.

Generic densities the north star asks for beyond the layout objective; used
in tests to validate HMC/VI/RW-MH statistically (correct moments, known
shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def gaussian(mean: Array, cov_diag: Array):
    mean = jnp.asarray(mean, jnp.float32)
    cov = jnp.asarray(cov_diag, jnp.float32)

    def logdensity(theta: Array) -> Array:
        return -0.5 * jnp.sum(jnp.square(theta - mean) / cov)

    return logdensity


def banana(a: float = 1.0, b: float = 0.3):
    """Rosenbrock-style banana in 2D (curved posterior shape)."""

    def logdensity(theta: Array) -> Array:
        x, y = theta[0], theta[1]
        return -0.5 * (jnp.square(x / a) + jnp.square(a * (y - b * (x * x + a * a))))

    return logdensity


def gaussian_mixture(means: Array, sigma: float = 1.0):
    means = jnp.asarray(means, jnp.float32)  # [K, D]

    def logdensity(theta: Array) -> Array:
        d2 = jnp.sum(jnp.square(theta[None, :] - means), axis=1)
        return jax.nn.logsumexp(-0.5 * d2 / (sigma * sigma)) - jnp.log(
            means.shape[0]
        )

    return logdensity
