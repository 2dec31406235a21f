"""Mean-field Gaussian variational inference on the same log-density.

North-star scope: reparameterized ELBO maximization with Adam (optax),
targeting any ``logdensity_fn`` — including the layout objective via
``mh_tpu.sampler.generic.layout_logdensity``. Returns the variational
parameters and the ELBO trace.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

Array = jax.Array
LogDensity = Callable[[Array], Array]


def elbo(key: Array, mu: Array, log_sigma: Array, logdensity_fn: LogDensity,
         n_mc: int) -> Array:
    """Monte-Carlo ELBO with the reparameterization trick."""
    sigma = jnp.exp(log_sigma)
    eps = jax.random.normal(key, (n_mc, *mu.shape))
    thetas = mu + sigma * eps
    lps = jax.vmap(logdensity_fn)(thetas)
    entropy = jnp.sum(log_sigma) + 0.5 * mu.shape[0] * (
        1.0 + jnp.log(2.0 * jnp.pi)
    )
    return jnp.mean(lps) + entropy


@partial(
    jax.jit, static_argnames=("logdensity_fn", "n_steps", "n_mc", "learning_rate")
)
def meanfield_vi(
    key: Array,
    logdensity_fn: LogDensity,
    theta0: Array,
    n_steps: int = 500,
    n_mc: int = 8,
    learning_rate: float = 0.05,
    init_log_sigma: float = -1.0,
):
    """Fit N(mu, diag(sigma^2)) by maximizing the ELBO.

    Returns ``(mu, sigma, elbo_trace f32[n_steps])``.
    """
    mu0 = jnp.asarray(theta0, jnp.float32)
    ls0 = jnp.full_like(mu0, init_log_sigma)
    opt = optax.adam(learning_rate)
    opt_state = opt.init((mu0, ls0))

    def loss_fn(params, k):
        mu, ls = params
        return -elbo(k, mu, ls, logdensity_fn, n_mc)

    def step(carry, i):
        params, opt_state = carry
        k = jax.random.fold_in(key, i)
        loss, grads = jax.value_and_grad(loss_fn)(params, k)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    (params, _), trace = jax.lax.scan(step, ((mu0, ls0), opt_state),
                                      jnp.arange(n_steps))
    mu, ls = params
    return mu, jnp.exp(ls), trace
