"""Hamiltonian Monte Carlo on the same log-density abstraction.

North-star scope (no reference counterpart): gradient-based sampling of
``logdensity_fn`` via leapfrog HMC with optional dual-averaging step-size
adaptation, vmappable over chains. The layout objective is piecewise
(clamps, maxes, AABB intersections — SURVEY.md §7.3): JAX autodiff yields
subgradients there, which is standard practice for HMC on such targets;
``mh_tpu.sampler.generic.layout_logdensity`` adapts the scene objective.
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
class HMCState:
    theta: Array
    logprob: Array
    grad: Array
    n_accept: Array
    # dual-averaging state (Hoffman & Gelman 2014, Alg. 5)
    log_eps: Array
    log_eps_avg: Array
    h_avg: Array


def hmc_init(logdensity_fn: LogDensity, theta0: Array, step_size: float) -> HMCState:
    lp, g = jax.value_and_grad(logdensity_fn)(theta0)
    return HMCState(
        theta=theta0,
        logprob=lp,
        grad=g,
        n_accept=jnp.int32(0),
        log_eps=jnp.log(jnp.float32(step_size)),
        log_eps_avg=jnp.log(jnp.float32(step_size)),
        h_avg=jnp.float32(0.0),
    )


def _leapfrog(logdensity_fn, theta, p, grad, eps, n_steps):
    def body(carry, _):
        theta, p, grad = carry
        p = p + 0.5 * eps * grad
        theta = theta + eps * p
        lp, grad = jax.value_and_grad(logdensity_fn)(theta)
        p = p + 0.5 * eps * grad
        return (theta, p, grad), lp

    (theta, p, grad), lps = jax.lax.scan(body, (theta, p, grad), None, length=n_steps)
    return theta, p, grad, lps[-1]


def hmc_step(
    key: Array,
    state: HMCState,
    logdensity_fn: LogDensity,
    n_leapfrog: int,
    step: Array,
    adapt: bool = True,
    target_accept: float = 0.8,
    t0: float = 10.0,
    gamma: float = 0.05,
    kappa: float = 0.75,
    mu_eps: float | None = None,
) -> HMCState:
    k_mom, k_acc = jax.random.split(key)
    eps = jnp.exp(state.log_eps)
    p0 = jax.random.normal(k_mom, state.theta.shape)
    theta1, p1, grad1, lp1 = _leapfrog(
        logdensity_fn, state.theta, p0, state.grad, eps, n_leapfrog
    )
    h0 = state.logprob - 0.5 * jnp.sum(jnp.square(p0))
    h1 = lp1 - 0.5 * jnp.sum(jnp.square(p1))
    log_ratio = h1 - h0
    # guard divergences: reject non-finite trajectories outright
    log_ratio = jnp.where(jnp.isfinite(log_ratio), log_ratio, -jnp.inf)
    accept_prob = jnp.exp(jnp.minimum(log_ratio, 0.0))
    acc = jnp.log(jax.random.uniform(k_acc)) < log_ratio

    theta = jnp.where(acc, theta1, state.theta)
    lp = jnp.where(acc, lp1, state.logprob)
    grad = jnp.where(acc, grad1, state.grad)

    log_eps, log_eps_avg, h_avg = state.log_eps, state.log_eps_avg, state.h_avg
    if adapt:
        m = step.astype(jnp.float32) + 1.0
        eta = 1.0 / (m + t0)
        h_avg = (1.0 - eta) * h_avg + eta * (target_accept - accept_prob)
        mu = jnp.log(10.0) + state.log_eps_avg if mu_eps is None else jnp.log(mu_eps)
        log_eps = mu - jnp.sqrt(m) / gamma * h_avg
        w = m ** (-kappa)
        log_eps_avg = w * log_eps + (1.0 - w) * log_eps_avg

    return HMCState(
        theta=theta,
        logprob=lp,
        grad=grad,
        n_accept=state.n_accept + acc.astype(jnp.int32),
        log_eps=log_eps,
        log_eps_avg=log_eps_avg,
        h_avg=h_avg,
    )


@partial(
    jax.jit,
    static_argnames=("logdensity_fn", "n_samples", "n_warmup", "n_leapfrog", "n_chains"),
)
def hmc_sample(
    key: Array,
    logdensity_fn: LogDensity,
    theta0: Array,
    n_samples: int,
    n_warmup: int = 100,
    n_leapfrog: int = 10,
    step_size: float = 0.1,
    n_chains: int = 1,
    target_accept: float = 0.8,
):
    """Adaptive HMC: warmup with dual averaging, then fixed-step sampling.

    Returns ``(samples f32[n_chains, n_samples, D], final HMCState batch)``.
    """
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (n_chains, *theta0.shape))

    def one_chain(ck, t0_theta):
        state = hmc_init(logdensity_fn, t0_theta, step_size)

        def warm(s, i):
            s = hmc_step(
                jax.random.fold_in(ck, i), s, logdensity_fn, n_leapfrog, i,
                adapt=True, target_accept=target_accept,
            )
            return s, None

        state, _ = jax.lax.scan(warm, state, jnp.arange(n_warmup))
        # freeze at the averaged step size
        state = dataclasses.replace(
            state, log_eps=state.log_eps_avg, n_accept=jnp.int32(0)
        )

        def draw(s, i):
            s = hmc_step(
                jax.random.fold_in(ck, n_warmup + i), s, logdensity_fn,
                n_leapfrog, i, adapt=False,
            )
            return s, s.theta

        state, samples = jax.lax.scan(draw, state, jnp.arange(n_samples))
        return samples, state

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_chains))
    return jax.vmap(one_chain)(keys, theta0)
