"""Metropolis-adjusted Langevin (MALA) on the generic log-density interface.

North-star scope (no reference counterpart; the reference only has the
random-walk kernel of ``Kernel.cu:576-713``). MALA proposes
``theta* = theta + eps^2/2 * grad(log pi)(theta) + eps * xi`` and corrects
with the asymmetric-proposal MH ratio — one gradient per step, a middle
ground between random-walk MH and leapfrog HMC on the same
``logdensity_fn`` abstraction (``mh_tpu.sampler.generic``). Like HMC/NUTS,
the layout objective's piecewise terms yield subgradients (SURVEY.md §7.3).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array
LogDensity = Callable[[Array], Array]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MALAState:
    theta: Array
    logprob: Array
    grad: Array
    n_accept: Array
    step: Array


def mala_init(logdensity_fn: LogDensity, theta0: Array) -> MALAState:
    lp, g = jax.value_and_grad(logdensity_fn)(theta0)
    return MALAState(
        theta=theta0,
        logprob=lp,
        grad=g,
        n_accept=jnp.int32(0),
        step=jnp.int32(0),
    )


def mala_step(
    key: Array, state: MALAState, logdensity_fn: LogDensity, step_size: Array
) -> MALAState:
    """One MALA iteration (cached gradient: one grad eval per step)."""
    k_prop, k_acc = jax.random.split(key)
    eps2 = step_size * step_size
    mean_fwd = state.theta + 0.5 * eps2 * state.grad
    star = mean_fwd + step_size * jax.random.normal(k_prop, state.theta.shape)
    lp_star, g_star = jax.value_and_grad(logdensity_fn)(star)

    # log q(theta | star) - log q(star | theta): Gaussian with the drifted
    # means; the eps^-2/2 normalization cancels.
    mean_rev = star + 0.5 * eps2 * g_star
    d_fwd = star - mean_fwd
    d_rev = state.theta - mean_rev
    log_q = (jnp.sum(d_fwd * d_fwd) - jnp.sum(d_rev * d_rev)) / (2.0 * eps2)

    log_ratio = lp_star - state.logprob + log_q
    acc = jnp.log(jax.random.uniform(k_acc)) < log_ratio
    return MALAState(
        theta=jnp.where(acc, star, state.theta),
        logprob=jnp.where(acc, lp_star, state.logprob),
        grad=jnp.where(acc, g_star, state.grad),
        n_accept=state.n_accept + acc.astype(jnp.int32),
        step=state.step + 1,
    )


@partial(jax.jit, static_argnames=("logdensity_fn", "n_samples", "n_chains", "thin"))
def mala_sample(
    key: Array,
    logdensity_fn: LogDensity,
    theta0: Array,
    n_samples: int,
    n_chains: int = 1,
    step_size: float = 0.1,
    thin: int = 1,
):
    """Vectorized MALA: returns (samples f32[n_chains, n_samples, D], final).

    ``theta0``: f32[D] (broadcast) or f32[n_chains, D].
    """
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (n_chains, *theta0.shape))

    def one_chain(ck, t0):
        state = mala_init(logdensity_fn, t0)

        def body(s, i):
            k = jax.random.fold_in(ck, i)

            def inner(ss, j):
                return mala_step(
                    jax.random.fold_in(k, j), ss, logdensity_fn,
                    jnp.float32(step_size),
                ), None

            s, _ = jax.lax.scan(inner, s, jnp.arange(thin))
            return s, s.theta

        state, samples = jax.lax.scan(body, state, jnp.arange(n_samples))
        return samples, state

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_chains))
    samples, final = jax.vmap(one_chain)(keys, theta0)
    return samples, final
