"""Proposal moves: translate / rotate / swap (SURVEY.md C6, ``Kernel.cu:576-704``).

Functional re-design of the reference `propose`:

- Move type drawn uniformly from {translate, rotate, swap} (``Kernel.cu:582``).
- Translate: one random unfrozen object, per-axis N(0, (extent/16)^2) step
  (``Kernel.cu:590-591``), clamped to the surface bounds (the reference's
  snap-to-edge if/else chain ``:613-630`` is exactly a clamp).
- Rotate: rotY += N(0, S_SIGMA_T^2), wrapped once into [0, 2*pi]
  (``Kernel.cu:641-651``).
- Swap: two random unfrozen objects exchange their full pose (x,y,z,rotX,
  rotY,rotZ — sizes/frozen stay put, ``Kernel.cu:674-700``); no-op when the
  scene has < 2 objects (``:657``); the pair may coincide (``:660``).

The reference re-draws frozen objects in a potentially unbounded loop
(``Kernel.cu:600-602``); here selection is a bounded masked-categorical draw
over the unfrozen set — semantics-preserving (uniform over unfrozen) and
vmap/jit-safe. When *everything* is frozen the move is a no-op instead of a
hang.

Compound block proposals — the deterministic equivalent of the reference's
64-threads-each-mutating-shared-state per iteration (``Kernel.cu:798``) —
apply K single-object moves sequentially via ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mh_tpu.config import CostMode, SamplerConfig
from mh_tpu.models.scene import Scene
from mh_tpu.ops.geometry import wrap_angle_once

Array = jax.Array


def pick_unfrozen(key: Array, scene: Scene) -> Array:
    """Uniform index over valid & unfrozen objects (bounded; no spin loop)."""
    ok = scene.obj_mask * (1.0 - scene.frozen.astype(jnp.float32))
    total = jnp.sum(ok)
    p = jnp.where(total > 0, ok / jnp.where(total > 0, total, 1.0),
                  scene.obj_mask / jnp.maximum(jnp.sum(scene.obj_mask), 1.0))
    return jax.random.choice(key, scene.n_pad_objs, p=p)


def translation_sigmas(scene: Scene, cfg: SamplerConfig) -> tuple[Array, Array]:
    """Per-axis proposal std = surface extent / 16 (``Kernel.cu:587-591``)."""
    mnx, mny, mxx, mxy = scene.surface_bounds()
    if cfg.sigma_xy_override > 0:
        s = jnp.float32(cfg.sigma_xy_override)
        return s, s
    return (mxx - mnx) / 16.0, (mxy - mny) / 16.0


def translate_move(
    key: Array, pose: Array, scene: Scene, cfg: SamplerConfig, scale: Array
) -> Array:
    k_obj, k_dx, k_dy = jax.random.split(key, 3)
    obj = pick_unfrozen(k_obj, scene)
    sx, sy = translation_sigmas(scene, cfg)
    dx = jax.random.normal(k_dx) * sx * scale
    dy = jax.random.normal(k_dy) * sy * scale
    mnx, mny, mxx, mxy = scene.surface_bounds()
    nx = jnp.clip(pose[obj, 0] + dx, mnx, mxx)
    ny = jnp.clip(pose[obj, 1] + dy, mny, mxy)
    return pose.at[obj, 0].set(nx).at[obj, 1].set(ny)


def rotate_move(
    key: Array, pose: Array, scene: Scene, cfg: SamplerConfig, scale: Array
) -> Array:
    k_obj, k_rot = jax.random.split(key)
    obj = pick_unfrozen(k_obj, scene)
    drot = jax.random.normal(k_rot) * cfg.sigma_t * scale
    new_rot = wrap_angle_once(pose[obj, 4] + drot, cfg.mode.pi)
    return pose.at[obj, 4].set(new_rot)


def swap_move(key: Array, pose: Array, scene: Scene) -> Array:
    k1, k2 = jax.random.split(key)
    i = pick_unfrozen(k1, scene)
    j = pick_unfrozen(k2, scene)
    row_i, row_j = pose[i], pose[j]
    swapped = pose.at[i].set(row_j).at[j].set(row_i)
    return jnp.where(scene.n_objs >= 2, swapped, pose)


def propose(
    key: Array, pose: Array, scene: Scene, cfg: SamplerConfig, scale: Array
) -> Array:
    """One single-object move, type uniform over {0,1,2} (``Kernel.cu:582``)."""
    k_type, k_move = jax.random.split(key)
    move = jax.random.randint(k_type, (), 0, 3)
    has_unfrozen = jnp.sum(scene.obj_mask * (1.0 - scene.frozen.astype(jnp.float32))) > 0
    new_pose = jax.lax.switch(
        move,
        [
            lambda k: translate_move(k, pose, scene, cfg, scale),
            lambda k: rotate_move(k, pose, scene, cfg, scale),
            lambda k: swap_move(k, pose, scene),
        ],
        k_move,
    )
    return jnp.where(has_unfrozen, new_pose, pose)


def block_propose(
    key: Array, pose: Array, scene: Scene, cfg: SamplerConfig, scale: Array
) -> Array:
    """K sequential single-object moves — one deterministic compound proposal.

    Capability-equivalent to the reference's per-thread simultaneous
    proposals on shared memory (``Kernel.cu:798``), without the races.
    """
    if cfg.n_moves_per_step == 1:
        return propose(key, pose, scene, cfg, scale)
    keys = jax.random.split(key, cfg.n_moves_per_step)

    def body(p, k):
        return propose(k, p, scene, cfg, scale), None

    out, _ = jax.lax.scan(body, pose, keys)
    return out
