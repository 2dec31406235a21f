"""Pallas TPU kernel for the Monte-Carlo pi estimator (BASELINE config 1).

The TPU-native re-creation of the NVIDIA ``MC_EstimatePiInlineP`` sample
(SURVEY.md B10) at kernel level: inline on-chip PRNG (the CUDA sample's
"inline PRNG" = per-thread cuRAND; here ``pltpu.prng_random_bits``),
hit-counting entirely in VMEM, one scalar per grid step. The XLA-path
estimator (:mod:`mh_tpu.models.pi`) is the CPU-runnable reference; this
kernel is the speed-of-light TPU version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = (256, 128)  # samples per inner draw
TILE_N = TILE[0] * TILE[1]


def _pi_kernel(seed_ref, out_ref, *, draws: int):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    def body(_, hits):
        xb = pltpu.bitcast(pltpu.prng_random_bits(TILE), jnp.uint32) >> 9
        yb = pltpu.bitcast(pltpu.prng_random_bits(TILE), jnp.uint32) >> 9
        x = pltpu.bitcast(xb, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 23))
        y = pltpu.bitcast(yb, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 23))
        inside = (x * x + y * y) <= 1.0
        # int32 accumulation: f32 would lose exact counts past 2^24 hits
        return hits + jnp.sum(inside.astype(jnp.int32))

    hits = jax.lax.fori_loop(0, draws, body, jnp.int32(0)).astype(jnp.float32)
    # write the scalar into lane (0,0) of this grid step's (8,128) tile
    ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out_ref[0, :, :] = jnp.where((ii == 0) & (jj == 0), hits, 0.0)


def estimate_pi_fused(seed: int, n_samples: int = 1 << 30, grid: int = 8):
    """Estimate pi fully on-chip. ``n_samples`` rounds up to a tile multiple.

    The per-block int32 hit counter bounds one call at ``grid * 2^31``
    samples (~2^34 at the default grid); the kernel itself is so far from
    compute-bound that the axon tunnel's fixed ~0.45 s per-call overhead
    dominates below ~2^30 samples (measured: the wall clock is flat from
    2^24 to 2^30), hence the large default.
    """
    draws = -(-n_samples // (TILE_N * grid))
    total = draws * TILE_N * grid
    kernel = functools.partial(_pi_kernel, draws=draws)
    hits = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[],
            out_specs=pl.BlockSpec((1, 8, 128), lambda g, *_: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((grid, 8, 128), jnp.float32),
    )(jnp.asarray([seed], jnp.int32))
    # divide by a float: a Python-int operand overflows int32 tracing for
    # total >= 2^31
    return 4.0 * jnp.sum(hits) / float(total), total
