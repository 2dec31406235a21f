"""Pallas TPU kernel for the Monte-Carlo pi estimator (BASELINE config 1).

The TPU-native re-creation of the NVIDIA ``MC_EstimatePiInlineP`` sample
(SURVEY.md B10) at kernel level: inline on-chip PRNG (the CUDA sample's
"inline PRNG" = per-thread cuRAND; here ``pltpu.prng_random_bits``),
hit-counting entirely in VMEM, one scalar per grid step. The XLA-path
estimator (:mod:`mh_tpu.models.pi`) is the CPU-runnable reference; this
kernel is the speed-of-light TPU version.

The draw count is a RUNTIME scalar (SMEM prefetch), so one compiled
executable serves every sample budget — which lets the benchmark measure
throughput as a linearity-fit slope over sample counts instead of a single
wall-clock point (the axon tunnel's per-call dispatch noise swung the
single-point number 6x between rounds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = (256, 128)  # samples per inner draw
TILE_N = TILE[0] * TILE[1]


def _pi_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    def body(_, hits):
        xb = pltpu.bitcast(pltpu.prng_random_bits(TILE), jnp.uint32) >> 9
        yb = pltpu.bitcast(pltpu.prng_random_bits(TILE), jnp.uint32) >> 9
        x = pltpu.bitcast(xb, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 23))
        y = pltpu.bitcast(yb, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 23))
        inside = (x * x + y * y) <= 1.0
        # int32 accumulation: f32 would lose exact counts past 2^24 hits
        return hits + jnp.sum(inside.astype(jnp.int32))

    # runtime draw count (seed_ref[1]): one executable per grid size
    hits = jax.lax.fori_loop(
        0, seed_ref[1], body, jnp.int32(0)
    ).astype(jnp.float32)
    # write the scalar into lane (0,0) of this grid step's (8,128) tile
    ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out_ref[0, :, :] = jnp.where((ii == 0) & (jj == 0), hits, 0.0)


_CALL_CACHE: dict = {}


def _pi_call(grid: int):
    call = _CALL_CACHE.get(grid)
    if call is None:
        call = jax.jit(
            pl.pallas_call(
                _pi_kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(grid,),
                    in_specs=[],
                    out_specs=pl.BlockSpec(
                        (1, 8, 128), lambda g, *_: (g, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ),
                out_shape=jax.ShapeDtypeStruct((grid, 8, 128), jnp.float32),
            )
        )
        _CALL_CACHE[grid] = call
    return call


def estimate_pi_fused(seed: int, n_samples: int = 1 << 30, grid: int = 8):
    """Estimate pi fully on-chip. ``n_samples`` rounds up to a tile multiple.

    The per-block int32 hit counter bounds one call at ``grid * 2^31``
    samples (~2^34 at the default grid); the kernel itself is so far from
    compute-bound that the axon tunnel's fixed per-call overhead dominates
    below ~2^30 samples, hence the large default (and the slope-based
    measurement in bench.py).
    """
    draws = -(-n_samples // (TILE_N * grid))
    total = draws * TILE_N * grid
    hits = _pi_call(grid)(jnp.asarray([seed, draws], jnp.int32))
    # divide by a float: a Python-int operand overflows int32 tracing for
    # total >= 2^31
    return 4.0 * jnp.sum(hits) / float(total), total
