"""The Metropolis-Hastings chain: accept rule, step, scan loop, vmapped chains.

TPU-native re-design of the reference chain kernel (SURVEY.md C7/C8,
``Kernel.cu:706-871``): one chain = one functional ``lax.scan`` program over
a ``(pose, costs, rng)`` PyTree; many chains = ``vmap`` over a leading chains
axis (the reference's grid of CUDA blocks, ``Kernel.cu:951``), ready to be
sharded over a device mesh by :mod:`mh_tpu.parallel`.

RNG is counter-based threefry: keys are ``fold_in``-derived per chain and
per step — deterministic and reproducible regardless of chain count or
sharding (replaces per-thread cuRAND XORWOW states seeded with
``time(NULL)+tid``, ``Kernel.cu:152-160,943``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from mh_tpu.config import CostMode, SamplerConfig
from mh_tpu.models.scene import Scene
from mh_tpu.ops.costs import CostBreakdown, cost_terms
from mh_tpu.sampler.proposal import block_propose

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MHState:
    """Per-chain sampler state (checkpointable PyTree)."""

    pose: Array  # f32[N,6]
    costs: CostBreakdown  # weighted breakdown of the current pose
    key: Array  # chain PRNG key
    step: Array  # i32 — global step counter
    n_accept: Array  # i32 — accepted proposals so far
    log_scale: Array  # f32 — log step-size scale (adaptation; 0 == reference)

    @property
    def accept_rate(self) -> Array:
        return self.n_accept / jnp.maximum(self.step, 1)


def boltzmann_accept(key: Array, cost_star: Array, cost_cur: Array, beta: float) -> Array:
    """u < min(1, exp(beta * (cost_star - cost_cur))) (``Kernel.cu:706-713``).

    Note the positive sign: higher total cost is better (terms are errors
    <= 0 scaled by mostly negative weights — SURVEY.md §2.3).
    """
    u = jax.random.uniform(key)
    ratio = jnp.exp(jnp.minimum(beta * (cost_star - cost_cur), 0.0))
    return u < ratio


def mh_init(pose: Array, scene: Scene, key: Array,
            mode: CostMode = CostMode.PARITY) -> MHState:
    return MHState(
        pose=pose,
        costs=cost_terms(pose, scene, mode, skip_unused_offlimits=True),
        key=key,
        step=jnp.int32(0),
        n_accept=jnp.int32(0),
        log_scale=jnp.float32(0.0),
    )


def finalize_costs(state: MHState, scene: Scene, cfg: SamplerConfig) -> MHState:
    """Fill in the OffLimits term skipped during the hot loop (PARITY mode).

    The hot loop omits the O(N^2) OffLimits matrix because the reference
    excludes it from the accept total (``Kernel.cu:547``); for faithful
    reporting (``resultCosts.OffLimitsCosts``, ``Kernel.cu:142``) it is
    recomputed once here on the final pose.
    """
    if cfg.mode is not CostMode.PARITY:
        return state
    from mh_tpu.ops.costs import off_limits_costs  # local to avoid cycle noise

    off = scene.w_offlimits * off_limits_costs(state.pose, scene, cfg.mode)
    return dataclasses.replace(
        state, costs=dataclasses.replace(state.costs, off_limits=off)
    )


def mh_step(
    state: MHState, scene: Scene, cfg: SamplerConfig, beta: Array | None = None
) -> MHState:
    """One MH iteration: propose -> cost -> accept (``Kernel.cu:785-828``).

    ``beta`` optionally overrides ``cfg.beta`` with a traced value — used by
    parallel tempering where each replica samples at its own temperature.
    """
    key_step = jax.random.fold_in(state.key, state.step)
    k_prop, k_acc = jax.random.split(key_step)
    scale = jnp.exp(state.log_scale)
    star = block_propose(k_prop, state.pose, scene, cfg, scale)
    star_costs = cost_terms(star, scene, cfg.mode, skip_unused_offlimits=True)
    acc = boltzmann_accept(
        k_acc, star_costs.total, state.costs.total,
        cfg.beta if beta is None else beta,
    )

    pose = jnp.where(acc, star, state.pose)
    costs = jax.tree.map(lambda s, c: jnp.where(acc, s, c), star_costs, state.costs)

    log_scale = state.log_scale
    if cfg.adapt:
        # Robbins-Monro drift toward the target acceptance rate.
        log_scale = log_scale + cfg.adapt_rate * (
            acc.astype(jnp.float32) - cfg.target_accept
        )

    return MHState(
        pose=pose,
        costs=costs,
        key=state.key,
        step=state.step + 1,
        n_accept=state.n_accept + acc.astype(jnp.int32),
        log_scale=log_scale,
    )


@partial(jax.jit, static_argnames=("cfg", "trace_costs", "trace_poses"))
def run_chain(
    key: Array,
    pose0: Array,
    scene: Scene,
    cfg: SamplerConfig,
    trace_costs: bool = False,
    trace_poses: bool = False,
):
    """Run one chain for ``cfg.iterations`` steps (``Kernel.cu:785``).

    Returns the final :class:`MHState` and a trace: ``trace_costs`` yields
    the f32[iterations] accepted-total trace; ``trace_poses`` additionally
    yields f32[iterations, N, 6] pose samples (for posterior moments of the
    layout parameters — mind the memory at large iteration counts).
    """
    state = mh_init(pose0, scene, key, cfg.mode)

    def body(s, _):
        s = mh_step(s, scene, cfg)
        out = None
        if trace_costs and trace_poses:
            out = (s.costs.total, s.pose)
        elif trace_costs:
            out = s.costs.total
        elif trace_poses:
            out = s.pose
        return s, out

    state, trace = jax.lax.scan(body, state, None, length=cfg.iterations)
    return finalize_costs(state, scene, cfg), trace


@partial(jax.jit, static_argnames=("cfg", "trace_costs", "trace_poses"))
def run_chains(
    key: Array,
    pose0: Array,
    scene: Scene,
    cfg: SamplerConfig,
    trace_costs: bool = False,
    trace_poses: bool = False,
):
    """Run ``cfg.n_chains`` independent chains via ``vmap``.

    ``pose0`` is either ``f32[N,6]`` (every chain starts from the same
    config, like the reference's grid of blocks over one input ``cfg``) or
    ``f32[n_chains,N,6]`` for per-chain starts.
    """
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(cfg.n_chains)
    )
    if pose0.ndim == 2:
        pose0 = jnp.broadcast_to(pose0, (cfg.n_chains, *pose0.shape))
    return jax.vmap(
        lambda k, p: run_chain(k, p, scene, cfg, trace_costs, trace_poses)
    )(keys, pose0)
