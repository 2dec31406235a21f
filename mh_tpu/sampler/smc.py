"""Sequential Monte Carlo over a temperature schedule, with distributed resampling.

The second communication-bearing sampler the BASELINE north star requires
(config 5): particles anneal from beta=0 (uniform over proposals) to the
target beta, reweighting by ``exp(dbeta * S)`` each stage, mutating with MH
steps at the current temperature, and resampling (systematic) whenever the
effective sample size drops below ``ess_threshold * n_particles``.

Sharded across the mesh chains axis: weights are normalized with global
``psum`` reductions; resampling gathers the particle ensemble with
``all_gather`` (fine for layout-scale states: 1024 particles x 100 objects
x 6 floats = 2.4 MB) and every device slices its shard of the globally
resampled index vector — deterministic and identical on all devices.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mh_tpu.config import SamplerConfig
from mh_tpu.models.scene import Scene
from mh_tpu.parallel.mesh import CHAINS_AXIS, to_varying
from mh_tpu.sampler.mh import finalize_costs, mh_init, mh_step

Array = jax.Array


def systematic_resample_indices(key: Array, log_w: Array, n: int) -> Array:
    """Systematic resampling: n indices from normalized log-weights."""
    w = jax.nn.softmax(log_w)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), minval=0.0, maxval=1.0 / n)
    pts = u0 + jnp.arange(n) / n
    return jnp.searchsorted(cdf, pts, side="left").astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "mesh", "n_particles", "n_stages", "mutate_steps", "adaptive",
        "init",
    ),
)
def run_smc(
    key: Array,
    pose0: Array,
    scene: Scene,
    cfg: SamplerConfig,
    mesh: Mesh,
    n_particles: int,
    n_stages: int = 10,
    mutate_steps: int = 5,
    ess_threshold: float = 0.5,
    adaptive: bool = False,
    target_ess: float = 0.5,
    init: str = "pose0",
):
    """Annealed SMC from beta=0 to ``cfg.beta``.

    Returns ``(states [n_particles,...], diagnostics)`` where diagnostics is
    a dict of per-stage ``ess`` (f32[n_stages]), ``resampled``
    (bool[n_stages]) and ``betas`` (f32[n_stages], the post-stage inverse
    temperature) traces, plus the final ``log_evidence`` estimate.

    ``adaptive``: choose each annealing increment by bisection so the
    post-increment ESS lands at ``target_ess * n_particles`` (Del
    Moral-Doucet-Jasra-style adaptive tempering). ``n_stages`` then acts
    as a stage *budget*: once the ladder reaches ``cfg.beta`` the
    remaining stages reweight by zero and keep mutating. The bisection
    uses only psum'd score moments, so the schedule is identical on every
    device.

    ``init``: ``"pose0"`` starts every particle at ``pose0`` (the
    reference's chain-start convention, ``Kernel.cu:770-783``) — note a
    point mass is a degenerate sample of the beta=0 prior, so the first
    reweight is a no-op and adaptive tempering will jump straight to the
    target until mutation diversifies the ensemble. ``"prior"`` draws
    i.i.d. uniform poses (x,y over the surface, rotY over [0,2pi)) for
    unfrozen objects — the statistically right initialization for the
    annealing identity and the log-evidence estimate.
    """
    if init not in ("pose0", "prior"):
        raise ValueError(f"init={init!r} (use 'pose0' or 'prior')")
    n_dev = mesh.shape[CHAINS_AXIS]
    if n_particles % n_dev:
        raise ValueError(f"n_particles={n_particles} not divisible by mesh {n_dev}")
    n_local = n_particles // n_dev
    beta_sched = jnp.linspace(0.0, cfg.beta, n_stages + 1)

    def device_fn(scene_rep: Scene, pose0_rep: Array):
        scene_rep, pose0_rep = to_varying((scene_rep, pose0_rep))
        dev = jax.lax.axis_index(CHAINS_AXIS)
        gids = dev * n_local + jnp.arange(n_local)
        keys = jax.vmap(lambda g: jax.random.fold_in(key, g))(gids)
        p0 = jnp.broadcast_to(pose0_rep, (n_local, *pose0_rep.shape))
        if init == "prior":
            mnx, mny, mxx, mxy = scene_rep.surface_bounds()
            movable = scene_rep.obj_mask * (
                1.0 - scene_rep.frozen.astype(jnp.float32)
            )

            def draw(k, p):
                kx, ky, kr = jax.random.split(k, 3)
                n_objs = p.shape[0]
                x = jax.random.uniform(kx, (n_objs,), minval=mnx, maxval=mxx)
                y = jax.random.uniform(ky, (n_objs,), minval=mny, maxval=mxy)
                r = jax.random.uniform(
                    kr, (n_objs,), minval=0.0, maxval=2.0 * cfg.mode.pi
                )
                p = p.at[:, 0].set(p[:, 0] + movable * (x - p[:, 0]))
                p = p.at[:, 1].set(p[:, 1] + movable * (y - p[:, 1]))
                p = p.at[:, 4].set(p[:, 4] + movable * (r - p[:, 4]))
                return p

            prior_keys = jax.vmap(
                lambda g: jax.random.fold_in(jax.random.fold_in(key, 0x9A1), g)
            )(gids)
            p0 = jax.vmap(draw)(prior_keys, p0)
        vary = to_varying
        states = vary(
            jax.vmap(lambda k, p: mh_init(p, scene_rep, k, cfg.mode))(keys, p0)
        )
        log_w = vary(jnp.zeros((n_local,), jnp.float32))

        def global_ess(log_w):
            m = jax.lax.pmax(jnp.max(log_w), CHAINS_AXIS)
            shifted = jnp.exp(log_w - m)
            z1 = jax.lax.psum(jnp.sum(shifted), CHAINS_AXIS)
            z2 = jax.lax.psum(jnp.sum(jnp.square(shifted)), CHAINS_AXIS)
            return jnp.square(z1) / jnp.maximum(z2, 1e-30), m, z1

        def stage(carry, t):
            states, log_w, log_z, beta_cur = carry
            if adaptive:
                # bisect the largest increment keeping ESS >= target
                scores = states.costs.total
                remaining = jnp.maximum(cfg.beta - beta_cur, 0.0)
                target = target_ess * n_particles

                def ess_of(db):
                    e, _, _ = global_ess(log_w + db * scores)
                    return e

                full_ok = ess_of(remaining) >= target

                def bis(_, lo_hi):
                    lo, hi = lo_hi
                    mid = 0.5 * (lo + hi)
                    ok = ess_of(mid) >= target
                    return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

                lo, _ = jax.lax.fori_loop(
                    0, 26, bis, (jnp.float32(0.0), remaining)
                )
                dbeta = jnp.where(full_ok, remaining, lo)
                beta_next = beta_cur + dbeta
            else:
                dbeta = beta_sched[t + 1] - beta_sched[t]
                beta_next = beta_sched[t + 1]

            # 1) reweight by the annealing increment
            log_w = log_w + dbeta * states.costs.total

            # 2) global normalization + ESS via psum; fold this stage's
            # normalizer into the evidence and RENORMALIZE the weights so
            # stages without a resample don't re-count it next stage
            ess, m, z1 = global_ess(log_w)
            stage_log_norm = m + jnp.log(z1 / n_particles)
            log_z = log_z + stage_log_norm
            log_w = log_w - stage_log_norm

            # 3) resample when ESS collapses (global decision, same everywhere)
            need = ess < ess_threshold * n_particles
            if adaptive:
                # an ESS-limited (partial) increment parks the ensemble
                # exactly AT the target ESS; without resampling, the next
                # bisection could only take a ~0 step and the schedule
                # stalls. Adaptive tempering therefore resamples after
                # every partial step (the standard resample-move cycle).
                need = need | ~full_ok

            def do_resample(args):
                states, log_w = args
                all_poses = jax.lax.all_gather(
                    states.pose, CHAINS_AXIS, tiled=True
                )  # [n_particles, N, 6]
                all_cvec = jax.lax.all_gather(
                    states.costs.as_vector(), CHAINS_AXIS, tiled=True
                )
                all_logw = jax.lax.all_gather(log_w, CHAINS_AXIS, tiled=True)
                k_rs = jax.random.fold_in(jax.random.fold_in(key, 0x5C), t)
                idx = systematic_resample_indices(k_rs, all_logw, n_particles)
                mine = jax.lax.dynamic_slice_in_dim(idx, dev * n_local, n_local)
                new_pose = all_poses[mine]
                cv = all_cvec[mine]
                costs = dataclasses.replace(
                    states.costs,
                    total=cv[:, 0], pair_wise=cv[:, 1], visual_balance=cv[:, 2],
                    focal_point=cv[:, 3], symmetry=cv[:, 4], clearance=cv[:, 5],
                    off_limits=cv[:, 6], surface_area=cv[:, 7],
                )
                states = dataclasses.replace(states, pose=new_pose, costs=costs)
                return states, vary(jnp.zeros_like(log_w))

            states, log_w = jax.lax.cond(
                need, do_resample, lambda a: a, (states, log_w)
            )

            # 4) mutate: MH steps at the current inverse temperature
            def mutate(s):
                def body(ss, _):
                    return mh_step(ss, scene_rep, cfg, beta=beta_next), None

                s, _ = jax.lax.scan(body, s, None, length=mutate_steps)
                return s

            states = jax.vmap(mutate)(states)
            return (states, log_w, log_z, beta_next), (ess, need, beta_next)

        (states, log_w, log_z, _), (ess_trace, resampled, betas_trace) = (
            jax.lax.scan(
                stage,
                (states, log_w, jnp.float32(0.0), jnp.float32(0.0)),
                jnp.arange(n_stages),
            )
        )
        states = jax.vmap(lambda s: finalize_costs(s, scene_rep, cfg))(states)
        return states, log_w, log_z, ess_trace, resampled, betas_trace

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(CHAINS_AXIS), P(CHAINS_AXIS), P(), P(), P(), P()),
    )
    states, log_w, log_z, ess_trace, resampled, betas_trace = sharded(
        scene, pose0
    )
    diagnostics = {
        "log_weights": log_w,
        "log_evidence": log_z,
        "ess": ess_trace,
        "resampled": resampled,
        "betas": betas_trace,
    }
    return states, diagnostics
