"""Generic-density samplers: the layout objective as one target among many.

The BASELINE north star asks for "MH as the base kernel ... plus generic
densities": this module provides a vectorized random-walk Metropolis kernel
over an arbitrary ``logdensity_fn(theta) -> f32[]`` plus the adapter that
exposes the furniture-layout objective as such a density (continuous
parameters = x, y, rotY of every unfrozen object; frozen/padded objects are
held fixed).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from mh_tpu.config import CostMode
from mh_tpu.models.scene import Scene
from mh_tpu.ops.costs import total_cost

Array = jax.Array
LogDensity = Callable[[Array], Array]


# --- layout objective as a generic density ---------------------------------


def theta_from_pose(pose: Array) -> Array:
    """Flatten the continuous layout parameters: [x | y | rotY] (f32[3N])."""
    return jnp.concatenate([pose[:, 0], pose[:, 1], pose[:, 4]])


def pose_from_theta(theta: Array, pose0: Array, scene: Scene) -> Array:
    """Rebuild a pose from theta; frozen/padded objects keep pose0's values."""
    n = pose0.shape[0]
    free = (scene.obj_mask > 0) & (~scene.frozen)
    x = jnp.where(free, theta[:n], pose0[:, 0])
    y = jnp.where(free, theta[n : 2 * n], pose0[:, 1])
    rot = jnp.where(free, theta[2 * n :], pose0[:, 4])
    return pose0.at[:, 0].set(x).at[:, 1].set(y).at[:, 4].set(rot)


def layout_logdensity(
    scene: Scene,
    pose0: Array,
    beta: float,
    mode: CostMode = CostMode.PARITY,
) -> LogDensity:
    """log pi(theta) = beta * total_cost(pose(theta)) — the MH stationary
    density implied by the reference accept rule (``Kernel.cu:712``)."""

    def logdensity(theta: Array) -> Array:
        return beta * total_cost(pose_from_theta(theta, pose0, scene), scene, mode)

    return logdensity


# --- vectorized random-walk Metropolis -------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RWState:
    theta: Array
    logprob: Array
    n_accept: Array
    step: Array


def rw_init(logdensity_fn: LogDensity, theta0: Array) -> RWState:
    return RWState(
        theta=theta0,
        logprob=logdensity_fn(theta0),
        n_accept=jnp.int32(0),
        step=jnp.int32(0),
    )


def rw_step(
    key: Array, state: RWState, logdensity_fn: LogDensity, step_size: Array
) -> RWState:
    k_prop, k_acc = jax.random.split(key)
    star = state.theta + step_size * jax.random.normal(k_prop, state.theta.shape)
    lp_star = logdensity_fn(star)
    log_ratio = lp_star - state.logprob
    acc = jnp.log(jax.random.uniform(k_acc)) < log_ratio
    return RWState(
        theta=jnp.where(acc, star, state.theta),
        logprob=jnp.where(acc, lp_star, state.logprob),
        n_accept=state.n_accept + acc.astype(jnp.int32),
        step=state.step + 1,
    )


@partial(jax.jit, static_argnames=("logdensity_fn", "n_samples", "n_chains", "thin"))
def rw_metropolis(
    key: Array,
    logdensity_fn: LogDensity,
    theta0: Array,
    n_samples: int,
    n_chains: int = 1,
    step_size: float = 0.5,
    thin: int = 1,
):
    """Vectorized RW-Metropolis: ``f32[n_chains, n_samples, D]`` samples.

    ``theta0``: f32[D] (broadcast) or f32[n_chains, D].
    """
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (n_chains, *theta0.shape))

    def one_chain(ck, t0):
        state = rw_init(logdensity_fn, t0)

        def body(s, i):
            k = jax.random.fold_in(ck, i)

            def inner(ss, j):
                return rw_step(jax.random.fold_in(k, j), ss, logdensity_fn,
                               jnp.float32(step_size)), None

            s, _ = jax.lax.scan(inner, s, jnp.arange(thin))
            return s, s.theta

        state, samples = jax.lax.scan(body, state, jnp.arange(n_samples))
        return samples, state

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_chains))
    samples, final = jax.vmap(one_chain)(keys, theta0)
    return samples, final
