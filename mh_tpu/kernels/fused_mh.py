"""Pallas TPU kernel: the entire MH chain loop fused on-chip.

The speed-of-light path the BASELINE performance gate asks for: proposal +
cost + accept for a block of chains run **entirely in VMEM** across all
iterations — one kernel launch per run, zero HBM round-trips between steps,
on-chip PRNG (``pltpu.prng_*``), and no per-step XLA dispatch.

Mapping (vs the reference's one-CUDA-block-per-chain, ``Kernel.cu:754``):
one grid step processes ``block_chains(n)`` chains; objects live in the
128-wide lane dimension and every cost term is a chain-vectorized 3-D tile
([B, N, N] / [B, C, N] / [B, 8, N]). The O(N^2) symmetry term is carried
incrementally: per-slab maxima of the match matrix persist in VMEM and a
step updates only the <=2 moved objects' slab row + lane — exact O(N) per
step (see ``sm_update``). Scene gathers (relationship endpoints, clearance
anchors) are precomputed one-hot matrices applied as tiny matmuls or
masked sublane sums — no dynamic indexing in the hot loop.

Semantics match :mod:`mh_tpu.sampler` (same moves, clamp/wrap rules, accept
rule, PARITY/FIXED objective) with a different — still counter-based,
deterministic — random stream, so chains are statistically equivalent but
not bitwise equal to the XLA path. The default stream is keyed by GLOBAL
chain id (see ``_uniform_sw``), so fused results are reproducible across
chain-block sizes, fit-cache states, and device counts; ``MH_FUSED_RNG=hw``
selects the hardware per-block stream instead (bc-dependent, A/B knob).

Thin-op engine (round 5, ``MH_FUSED_THIN=1`` default): the step's
per-chain scalar chains (proposal Box-Muller/rank-pick, rel+angle
penalties, clearance outside-areas) run with chains on the LANE axis
([1,B]/[E,B] tiles — 1 vreg per op at B=128, vs 16 vregs for a [B,1]
tile with one live lane) and move their few per-chain results back to
column layout with exact identity-MXU dots (HIGHEST precision single
1.0*v products). Bitwise-identical trajectories to the wide layout
(tests/test_fused_thin.py); took the 100-object headline from the XLA
scan (docs/PERFORMANCE.md "CURRENT NUMBERS").
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
_DEBUG_SKIP = os.environ.get('MH_FUSED_SKIP', '')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mh_tpu.config import BIG, CostMode, SamplerConfig
from mh_tpu.models.scene import Scene

Array = jax.Array

LANE = 128


def block_chains(n: int) -> int:
    """Chains per grid step for a scene padded to ``n`` object lanes.

    All cost terms are chain-vectorized 3-D tiles, so larger blocks
    amortize per-iteration bookkeeping until the O(B*n) VMEM temps bind.
    Round-4 linearity fits at the headline shape (n=128, 1024 chains,
    v5e, unroll 4, 2026-08-21): B=64: 0.1025, B=128 (64M vmem):
    0.0973-0.0979, B=256: 0.112 ms/step — so the default is now B=128
    for n <= 128 (the round-3 verdict against it, 0.119, was measured at
    unroll 16 / 32M where the doubled unrolled block crossed the Mosaic
    scheduling knee; at unroll 4 it compiles in ~44-107 s). ``_get_runner``
    raises the scoped-VMEM request (bounded by ``PREF_VMEM_CAP``) so the
    preferred block actually fits the sizing model; the fit check
    (``fused_vmem_estimate``) and the runtime compile-failure retry still
    shrink it when the model or the chip disagrees, so this is a starting
    point, not a guarantee. ``MH_FUSED_BLOCK`` overrides.
    """
    env = os.environ.get("MH_FUSED_BLOCK", "")
    if env:
        return int(env)
    if n <= 128:
        return 128
    if n <= 256:
        # round-4 sweep at n=256 / 1024 chains (96M vmem, fresh compiles):
        # B=16 (old fit): 0.209, B=32: 0.171, B=64: 0.162, B=128: 0.168
        return 64
    # larger scenes: scale the block down with n, SUBLANE-ALIGNED — a
    # non-multiple-of-8 block (e.g. 4096//384 = 10) both misaligns the
    # [B, N] tiles and strands the divisibility clamp in _get_runner on
    # widths that cannot divide power-of-two chain counts (a 384-object
    # fused run raised "n_chains must be a multiple of 5" before this)
    return max(8, (4096 // n) & ~7)


# Default scoped-VMEM limit handed to Mosaic. 17 MB = XLA's 16 MB default
# + 1 (the largest "free" raise); fused_vmem_estimate may raise it further
# when even the floor block cannot fit. ~100 MB compiles and runs on v5e.
DEFAULT_VMEM = 17 << 20
MAX_VMEM = 96 << 20
# ceiling for the AUTOMATIC scoped-VMEM raise that lets the preferred
# block_chains() block fit the sizing model (round-4: B=128 at n=128
# estimates ~20.4 MB > the 17 MB default and measures 5% faster; blocks
# larger than ~64 MB of scratch bought nothing on v5e)
PREF_VMEM_CAP = 64 << 20
_BC_FLOOR = 8


def fused_vmem_estimate(
    bc: int, n: int, incremental: bool = True, fixed: bool = False,
    slab_w: int = 8,
) -> int:
    """Estimated scoped-VMEM bytes for one grid step of the fused kernel.

    Explicit scratch (pose/aux/cur planes + the two [B, N/8, N] slab
    states) is exact; Mosaic's on-stack temporaries are modeled as
    ``q*n^2/8 + l*n`` f32 words per chain, calibrated against the one
    hard measurement we have — the round-2 compile error's 18.85 MB at
    B=128, n=128 (q~13, l~41; we use q=14, l=48 for margin). The
    non-incremental A/B path evaluates full [B, N, N] symmetry tiles in
    the hot loop — several live at once — so its quadratic term is ~4x
    larger. Used to pre-shrink the chain block before compiling; the
    runtime retry in ``_call_fused_protected`` catches what the model
    misses.
    """
    # the two slab states are [bc, n/slab_w, n] each
    scratch_words = bc * (6 * n + LANE + 2 * (n * n) // slab_w)
    q = 14 if incremental else 48
    if fixed:
        # FIXED mode carries the off-limits pair-sum state updates
        # (so_star + its slab-row temps) live through the accept decision:
        # measured at B=128, n=128 the PARITY-sized request (24M) OOMs
        # while 32M compiles and runs — model the extra as +8 n^2/8 tiles
        # (lands the auto-raise at ~34M: the working point plus margin)
        q += 8
    temp_words = bc * (q * (n * n) // 8 + 48 * n)
    return 4 * (scratch_words + temp_words)


def _fit_block_and_vmem(
    bc: int, n: int, vmem: int, incremental: bool = True, fixed: bool = False,
    slab_w: int = 8,
) -> tuple[int, int]:
    """Shrink ``bc`` (then raise ``vmem``) until the estimate fits."""
    while (
        bc > _BC_FLOOR
        and fused_vmem_estimate(bc, n, incremental, fixed, slab_w) > 0.92 * vmem
    ):
        bc //= 2
    if fused_vmem_estimate(bc, n, incremental, fixed, slab_w) > 0.92 * vmem:
        vmem = min(
            int(fused_vmem_estimate(bc, n, incremental, fixed, slab_w) / 0.85),
            MAX_VMEM,
        )
    return bc, vmem

_NEG_HUGE = -1e30

# clearance counts up to this unroll as [B, N] plane math with params in
# SMEM (~4x less VPU work than the 8-sublane-padded [B, C, N] tile when
# only 1-4 clearances are real); larger counts keep the tile path
CLR_UNROLL_MAX = 4

# scene plane indices (packed [P, N] array)
P_MASK, P_OK, P_AREA = 0, 1, 2
P_OV0X, P_OTAILX, P_OMINX, P_OMINY, P_OMAXX, P_OMAXY = 3, 4, 5, 6, 7, 8
P_RANK = 9  # 1-based rank of each unfrozen object among the unfrozen set
N_PLANES = 10

# scalar indices (packed f32[32] SMEM vector)
(S_WPW, S_WVB, S_WFP, S_WSY, S_WCL, S_WOL, S_WSA,
 S_CX2, S_CY2, S_FX, S_FY, S_FROT,
 S_MNX, S_MNY, S_MXX, S_MXY,
 S_SIGX, S_SIGY, S_SIGT, S_BETA, S_NOBJ, S_SCALE, S_NUNF,
 S_ADAPTR, S_TARGET) = range(25)
N_SCALARS = 32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class PackedScene:
    """Host-side packing of a Scene for the fused kernel."""

    planes: Array  # f32[N_PLANES, N]
    scalars: Array  # f32[N_SCALARS]
    rel_src_oh: Array  # f32[R, N]
    rel_tgt_oh: Array  # f32[R, N]
    rel_params: Array  # f32[R, 128]: 0 lo, 1 hi, 2 mask
    ang_src_oh: Array
    ang_tgt_oh: Array
    ang_params: Array  # f32[A, 128]: 0 amin, 1 amax, 2 mask
    clr_src_oh: Array  # f32[C, N]
    clr_params: Array  # f32[C, 128]: 0 v0x, 1 tailx, 2 minx, 3 miny, 4 maxx,
    #                    5 maxy, 6 mask, 7 parity_anchor (min(i, N-1))
    clr_scal: Array  # f32[CLR_UNROLL_MAX*8] — same params flattened for the
    #                  SMEM unrolled clearance path (c*8 + field)
    n_clr_real: int  # real (unpadded) clearance count
    clr_anchors: tuple  # static parity anchor index per real clearance
    n: int  # padded object lanes


def pack_scene(scene: Scene, cfg: SamplerConfig) -> PackedScene:
    """Pack a Scene into lane-aligned kernel inputs (done once per scene)."""
    n0 = scene.n_pad_objs
    n = _round_up(n0, LANE)

    def padn(a):
        return np.pad(np.asarray(a, np.float32), (0, n - n0))

    mask = padn(scene.obj_mask)
    ok = np.asarray(scene.obj_mask, np.float32) * (
        1.0 - np.asarray(scene.frozen, np.float32)
    )
    planes = np.zeros((N_PLANES, n), np.float32)
    planes[P_MASK] = mask
    planes[P_OK] = padn(ok)
    planes[P_RANK] = padn(np.cumsum(ok))
    planes[P_AREA] = padn(np.asarray(scene.sizes)[:, 0] * np.asarray(scene.sizes)[:, 1])
    planes[P_OV0X] = padn(scene.off_rects.v0x)
    planes[P_OTAILX] = padn(scene.off_rects.tail_min_x)
    planes[P_OMINX] = padn(scene.off_rects.min_x)
    planes[P_OMINY] = padn(scene.off_rects.min_y)
    planes[P_OMAXX] = padn(scene.off_rects.max_x)
    planes[P_OMAXY] = padn(scene.off_rects.max_y)

    mnx, mny, mxx, mxy = (float(v) for v in scene.surface_bounds())
    sigx = (mxx - mnx) / 16.0
    sigy = (mxy - mny) / 16.0
    if cfg.sigma_xy_override > 0:
        sigx = sigy = cfg.sigma_xy_override
    scalars = np.zeros(N_SCALARS, np.float32)
    scalars[S_WPW] = float(scene.w_pairwise)
    scalars[S_WVB] = float(scene.w_visual_balance)
    scalars[S_WFP] = float(scene.w_focal)
    scalars[S_WSY] = float(scene.w_symmetry)
    scalars[S_WCL] = float(scene.w_clearance)
    scalars[S_WOL] = float(scene.w_offlimits)
    scalars[S_WSA] = float(scene.w_surface_area)
    scalars[S_CX2] = float(scene.centroid[0]) / 2.0
    scalars[S_CY2] = float(scene.centroid[1]) / 2.0
    scalars[S_FX] = float(scene.focal[0])
    scalars[S_FY] = float(scene.focal[1])
    scalars[S_FROT] = float(scene.focal_rot)
    scalars[S_MNX], scalars[S_MNY] = mnx, mny
    scalars[S_MXX], scalars[S_MXY] = mxx, mxy
    scalars[S_SIGX], scalars[S_SIGY], scalars[S_SIGT] = sigx, sigy, cfg.sigma_t
    scalars[S_BETA] = cfg.beta
    scalars[S_NOBJ] = float(np.sum(np.asarray(scene.obj_mask) > 0))
    scalars[S_SCALE] = 1.0
    scalars[S_NUNF] = float(np.sum(ok))
    scalars[S_ADAPTR] = float(cfg.adapt_rate)
    scalars[S_TARGET] = float(cfg.target_accept)

    # Pad entity counts (relationships/angles/clearances) to a sublane tile
    # (multiple of 8). Entities ride the SUBLANE axis of [B, E, N] /
    # [B, E, 1] tiles; masked entity sums reduce over sublanes (native),
    # never over tiny lane dims (Mosaic miscompiles e.g. [1, 2] lane sums).
    def ent_pad(count: int) -> int:
        return _round_up(max(count, 1), 8)

    def one_hot(idx, m):
        out = np.zeros((ent_pad(len(idx)), n), np.float32)
        out[np.arange(len(idx)), np.asarray(idx)] = np.asarray(m, np.float32)
        return out

    def params(cols):
        out = np.zeros((ent_pad(len(cols[0])), LANE), np.float32)
        for j, c in enumerate(cols):
            out[: len(c), j] = np.asarray(c, np.float32)
        return out

    rel_m = np.asarray(scene.rel_mask)
    ang_m = np.asarray(scene.ang_mask)
    clr_m = np.asarray(scene.clr_mask)
    clr_anchor = np.minimum(np.arange(len(clr_m)), n0 - 1)  # Kernel.cu:456 quirk

    clr_cols = [
        scene.clr_rects.v0x, scene.clr_rects.tail_min_x,
        scene.clr_rects.min_x, scene.clr_rects.min_y,
        scene.clr_rects.max_x, scene.clr_rects.max_y,
    ]
    n_clr_real = int(clr_m.sum())
    clr_scal = np.zeros(CLR_UNROLL_MAX * 8, np.float32)
    for c in range(min(n_clr_real, CLR_UNROLL_MAX)):
        for j, col in enumerate(clr_cols):
            clr_scal[c * 8 + j] = float(np.asarray(col)[c])

    return PackedScene(
        planes=jnp.asarray(planes),
        scalars=jnp.asarray(scalars),
        rel_src_oh=jnp.asarray(one_hot(scene.rel_src, rel_m)),
        rel_tgt_oh=jnp.asarray(one_hot(scene.rel_tgt, rel_m)),
        rel_params=jnp.asarray(params([scene.rel_lo, scene.rel_hi, rel_m])),
        ang_src_oh=jnp.asarray(one_hot(scene.ang_src, ang_m)),
        ang_tgt_oh=jnp.asarray(one_hot(scene.ang_tgt, ang_m)),
        ang_params=jnp.asarray(params([scene.ang_min, scene.ang_max, ang_m])),
        clr_src_oh=jnp.asarray(one_hot(scene.clr_src, clr_m)),
        clr_params=jnp.asarray(
            params(
                [
                    scene.clr_rects.v0x,
                    scene.clr_rects.tail_min_x,
                    scene.clr_rects.min_x,
                    scene.clr_rects.min_y,
                    scene.clr_rects.max_x,
                    scene.clr_rects.max_y,
                    clr_m,
                    clr_anchor,
                ]
            )
        ),
        clr_scal=jnp.asarray(clr_scal),
        n_clr_real=n_clr_real,
        clr_anchors=tuple(int(v) for v in clr_anchor[:n_clr_real]),
        n=n,
    )


def _atan2(y, x):
    """Branchless f32 atan2 (Mosaic has no atan2 lowering).

    Minimax polynomial for atan on [0,1] + quadrant folding; max abs error
    ~1e-6 rad, well inside the objective's f32 tolerance.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    a = mn / jnp.maximum(mx, 1e-30)
    s = a * a
    p = -0.0117212
    p = p * s + 0.05265332
    p = p * s + -0.11643287
    p = p * s + 0.19354346
    p = p * s + -0.33262347
    p = p * s + 0.99997726
    r = a * p
    r = jnp.where(ay > ax, (math.pi / 2) - r, r)
    r = jnp.where(x < 0, math.pi - r, r)
    return jnp.where(y < 0, -r, r)


def _uniform(shape):
    """f32 uniforms in (0,1) from on-chip random bits."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32) >> 9
    # >>9 leaves 23 bits, so the int32 view is non-negative and casts cleanly
    return pltpu.bitcast(bits, jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 23)
    ) + 1e-7


def _i32c(v: int) -> jnp.int32:
    """int32 constant from a uint32 literal (wraps to two's complement)."""
    return jnp.int32(np.int64(np.uint32(v).astype(np.int32)))


def _uniform_sw(base, shape, row_offset=0, transposed=False):
    """Counter-based uniforms (triple32-style integer mixing).

    Pure jnp/lax ops, so it runs under the Pallas CPU interpreter — which
    has no lowering for the hardware ``prng_*`` primitives — AND compiles
    on TPU. This is the DEFAULT fused-kernel stream: with ``row_offset``
    set to the grid block's first global chain index, every draw is a pure
    function of (seed, global chain id, draw counter, lane) — so chain
    trajectories are invariant to the chain-block size ``bc`` (fit-cache
    state, OOM retries) and to the device count, unlike the block-seeded
    hardware stream (``MH_FUSED_RNG=hw``), whose [B, LANE] tile layout
    bakes ``bc`` into each chain's stream (round-3 advisor finding).
    ``base`` is a traced i32 unique per draw (seed/counter mix).

    ``transposed``: shape is [draw_lanes, chains] (chains on the LANE
    axis — the thin-engine layout); the counter mapping keeps chain on
    axis 1 and draw-lane on axis 0, so draw (chain, lane) produces the
    SAME bits in either orientation and thin/non-thin trajectories match.
    """
    shr = jax.lax.shift_right_logical
    if transposed:
        flat = (
            (jax.lax.broadcasted_iota(jnp.int32, shape, 1) + row_offset)
            * shape[0]
            + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        )
    else:
        flat = (
            (jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row_offset)
            * shape[-1]
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        )
    x = flat ^ base

    def mix(x):
        x = x ^ shr(x, 17)
        x = x * _i32c(0xED5AD4BB)
        x = x ^ shr(x, 11)
        x = x * _i32c(0xAC4C1B51)
        x = x ^ shr(x, 15)
        x = x * _i32c(0x31848BAB)
        x = x ^ shr(x, 14)
        return x

    bits = shr(mix(mix(x)), 9)  # 23 mantissa bits, non-negative
    return bits.astype(jnp.float32) * (1.0 / (1 << 23)) + 1e-7


def _fused_kernel(
    seed_ref,  # SMEM i32[3]: [seed, iteration count, first-chain offset]
    scal_ref,  # SMEM f32[N_SCALARS]
    clr_scal_ref,  # SMEM f32[CLR_UNROLL_MAX*8] (unrolled clearance params)
    pose_ref,  # VMEM f32[6, B, N] (aliased in/out)
    planes_ref,  # VMEM f32[N_PLANES, N]
    rel_s_ref, rel_t_ref, rel_p_ref,
    ang_s_ref, ang_t_ref, ang_p_ref,
    clr_s_ref, clr_p_ref,
    pose_out_ref,  # VMEM f32[6, B, N]
    stats_ref,  # VMEM f32[B, LANE]: 0..7 breakdown, 8 n_accept
    *,
    mode: CostMode,
    n: int,
    report_offlimits: bool,
    incremental: bool,
    moves_per_step: int = 1,
    adapt: bool = False,
    clr_unroll: bool = False,
    n_clr_real: int = 0,
    clr_anchors: tuple = (),
    accept_draws: int = 1,
    rng_hw: bool = False,
    thin: bool = False,
    slab_w: int = 8,
    track_off: bool = True,
):
    B = pose_ref.shape[1]
    pi = mode.pi
    parity = mode is CostMode.PARITY
    # FIXED-mode off-limits state is tracked only when the scene actually
    # weights the term: with w_offlimits == 0 (e.g. the demo harness —
    # the reference leaves WeightOffLimits uninitialized, Kernel.cu:1014)
    # the weighted term is identically 0 and skipping its whole slab-sum
    # machinery is exact. The final report still evaluates the unweighted
    # overlap via off_limits_chunked.
    track_off = track_off and not parity

    # Default stream: counter-based per GLOBAL chain (seed_ref[2] is the
    # device's first-chain offset on sharded meshes) — invariant to the
    # chain-block size and device count. ``rng_hw`` restores the hardware
    # per-global-block stream (bc-dependent; A/B knob).
    first_chain = seed_ref[2] + pl.program_id(0) * B
    if rng_hw:
        pltpu.prng_seed(seed_ref[0] + seed_ref[2] // B + pl.program_id(0))

    def onehot_gather(plane, oh):
        """Entity gather [B,N] x one-hot [M,N] -> [B,M] via an MXU dot.

        HIGHEST precision is load-bearing: each output has exactly one
        nonzero 1.0*v term, so the 3-pass f32 path returns the selected
        value verbatim, while the DEFAULT-precision MXU path rounds
        operands through bf16 — measured 0.7% clearance error. (A
        bitwise-equal VPU masked [B,M,N] reduction existed as
        MH_FUSED_GATHER=vpu; it measured 5x slower and its tiles blew the
        Mosaic compile past 40 min — deleted round 5, post-mortem in
        docs/PERFORMANCE.md round-3/4 notes.)"""
        return jax.lax.dot_general(
            plane, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    # ---- thin-engine transpose helpers (MH_FUSED_THIN) -------------------
    # The step's per-chain scalar chains (proposal params, rel+angle
    # penalties, clearance anchors/outside-areas) are ~100 ops on
    # [B,1]/[B,8] tiles, each of which costs the SAME vreg volume as a
    # full [B,128] op (a [128,1] f32 tile is 16 vregs with one live
    # lane). The thin engine computes those chains with chains on the
    # LANE axis instead ([1,B]/[8,B] tiles — 1 vreg per op) and moves the
    # handful of per-chain results back to [B,1] layout with an identity
    # MXU dot. The dots are exact at HIGHEST precision (each output is a
    # single 1.0*v product — same argument as onehot_gather), so thin and
    # wide layouts produce bitwise-identical values.
    if thin:
        ident_b = (
            jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
        ).astype(jnp.float32)

        def t_cols(rows):
            """[K, B] rows (chains on lanes) -> [B, K] columns, exact."""
            return jax.lax.dot_general(
                ident_b, rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def t_row(col):
            """[B, 1] column -> [1, B] row (chains on lanes), exact."""
            return jax.lax.dot_general(
                col, ident_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def gather_t(oh, planes):
            """One-hot [M, N] x stacked planes [P, N] -> [M, P], exact."""
            return jax.lax.dot_general(
                oh, planes, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    mask = planes_ref[P_MASK, :]  # f32[N]
    okv = planes_ref[P_OK, :]  # 1.0 for movable (unfrozen, real) objects
    rankv = planes_ref[P_RANK, :]  # 1-based rank among movable objects
    area = planes_ref[P_AREA, :]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
    mask_row = mask.reshape(1, n)

    beta = scal_ref[S_BETA]
    w_pw, w_vb, w_fp = scal_ref[S_WPW], scal_ref[S_WVB], scal_ref[S_WFP]
    w_sy, w_cl, w_ol, w_sa = (
        scal_ref[S_WSY], scal_ref[S_WCL], scal_ref[S_WOL], scal_ref[S_WSA]
    )
    mnx, mny, mxx, mxy = (
        scal_ref[S_MNX], scal_ref[S_MNY], scal_ref[S_MXX], scal_ref[S_MXY]
    )
    fx, fy, frot = scal_ref[S_FX], scal_ref[S_FY], scal_ref[S_FROT]
    ux, uy = jnp.cos(frot), jnp.sin(frot)
    n_objs = scal_ref[S_NOBJ]
    n_unf = scal_ref[S_NUNF]
    has_unfrozen = n_unf > 0.0

    def aabb_minx(v0x, tailx, minx, tx):
        if parity:
            return jnp.minimum(v0x, tailx + tx)
        return minx + tx

    def obj_aabbs(x, y):
        """Off-limits AABBs for pose planes x, y of shape [..., N]."""
        omnx = aabb_minx(
            planes_ref[P_OV0X, :], planes_ref[P_OTAILX, :], planes_ref[P_OMINX, :], x
        )
        omny = planes_ref[P_OMINY, :] + y
        omxx = planes_ref[P_OMAXX, :] + x
        omxy = planes_ref[P_OMAXY, :] + y
        return omnx, omny, omxx, omxy

    def inter_area(amnx, amny, amxx, amxy, bmnx, bmny, bmxx, bmxy):
        x5 = jnp.maximum(amnx, bmnx)
        y5 = jnp.maximum(amny, bmny)
        x6 = jnp.minimum(amxx, bmxx)
        y6 = jnp.minimum(amxy, bmxy)
        empty = (x5 >= x6) | (y5 >= y6)
        return jnp.where(empty, 0.0, (x6 - x5) * (y6 - y5))

    def outside_area(rmnx, rmny, rmxx, rmxy):
        # The reference sums the rect's intersections with 4 disjoint
        # complement pieces of the surface (Kernel.cu:343-364); the pieces
        # partition the complement, so the sum equals
        # area(rect) - area(rect & surface) exactly in real arithmetic.
        # Numerics: the difference form carries absolute error ~ulp(area)
        # (=~1.2e-7 * rect area) on thin slivers of mostly-inside rects,
        # vs ~ulp(sliver) for the piecewise form the XLA engine keeps
        # (geometry.outside_surface_area); max(0, .) bounds the sign.
        # Measured on v5e at the 100-obj/1024-chain config: this form runs
        # the whole kernel at 0.09-0.12 ms/step (run-to-run spread) vs
        # 0.199 (original 4x inter_area) and 0.210 (direct clamped sliver
        # products) — the shorter dependency chain matters more than the
        # op count.
        return jnp.maximum(
            (rmxx - rmnx) * (rmxy - rmny)
            - inter_area(rmnx, rmny, rmxx, rmxy, mnx, mny, mxx, mxy),
            0.0,
        )

    def theta_fn(xi, yi, xj, yj, ti):
        t = _atan2(yi - yj, xi - xj)
        t = jnp.where(t < 0, 2 * pi + t, t)
        t = t - ti
        return jnp.where(t < 0, 2 * pi + t, t)

    # surface-area parity anchors (Kernel.cu:456 quirk): pose-independent
    # one-hot gather matrix, hoisted out of the per-iteration cost eval
    c_cnt_s = clr_p_ref.shape[0]
    # (thin mode gathers the anchors through the gather matrix instead)
    anc_oh = None if (clr_unroll or thin) else (
        iota_n.reshape(1, n) == clr_p_ref[:, 7].reshape(c_cnt_s, 1)
    ).astype(jnp.float32)  # [C, N]

    # --- loop-invariant scene loads + one-hot gather assembly, hoisted ----
    # out of the per-step cost eval: these loads/reshapes/concats are
    # pose-independent, and in-loop they re-emit ~10 thin ops per step
    # (every thin op costs ~25-30 cycles at the headline shape — the step
    # prices op count, docs/PERFORMANCE.md round-4 notes).
    rel_s_h = rel_s_ref[:, :]  # [R, N]
    rel_t_h = rel_t_ref[:, :]
    a_s_h = ang_s_ref[:, :]
    a_t_h = ang_t_ref[:, :]
    r_cnt = rel_s_h.shape[0]
    a_cnt = a_s_h.shape[0]
    if thin:
        # thin-engine gather matrix: every section padded to its full
        # sublane-aligned entity count (R/A are ent_pad multiples of 8,
        # clearances ride the padded [Cp, N] one-hot + a padded parity
        # anchor block), so the [M, bw] transposed gather outputs can be
        # row-sliced at aligned offsets. Padding rows gather garbage that
        # the per-entity masks zero out downstream.
        _gparts = [rel_s_h, rel_t_h, a_s_h, a_t_h, clr_s_ref[:, :]]
        if parity:
            anc_full_h = (
                iota_n == clr_p_ref[:, 7].reshape(c_cnt_s, 1)
            ).astype(jnp.float32)  # [Cp, N]
            _gparts.append(anc_full_h)
    else:
        _gparts = [rel_s_h, rel_t_h, a_s_h, a_t_h]
        if clr_unroll and n_clr_real:
            clr_src_h = clr_s_ref[0:n_clr_real, :]  # [C, N]
            _gparts.append(clr_src_h)
            if parity:
                anc_rows_h = jnp.concatenate(
                    [
                        (iota_n == float(clr_anchors[c])).astype(jnp.float32)
                        for c in range(n_clr_real)
                    ],
                    axis=0,
                )  # [C, N]
                _gparts.append(anc_rows_h)
    gmat_h = jnp.concatenate(_gparts, axis=0)  # [M, N]
    lo_h = rel_p_ref[:, 0].reshape(1, r_cnt)
    hi_h = rel_p_ref[:, 1].reshape(1, r_cnt)
    rm_h = rel_p_ref[:, 2].reshape(1, r_cnt)
    amin_h = ang_p_ref[:, 0].reshape(1, a_cnt)
    amax_h = ang_p_ref[:, 1].reshape(1, a_cnt)
    am_h = ang_p_ref[:, 2].reshape(1, a_cnt)
    cv0_h = clr_p_ref[:, 0].reshape(1, c_cnt_s)
    ctl_h = clr_p_ref[:, 1].reshape(1, c_cnt_s)
    cmn_h = clr_p_ref[:, 2].reshape(1, c_cnt_s)
    cmy_h = clr_p_ref[:, 3].reshape(1, c_cnt_s)
    cMx_h = clr_p_ref[:, 4].reshape(1, c_cnt_s)
    cMy_h = clr_p_ref[:, 5].reshape(1, c_cnt_s)
    cm_h = clr_p_ref[:, 6].reshape(1, c_cnt_s)
    # thin-engine column-oriented entity params ([E, 1] — broadcast over
    # the chain LANE axis of [E, B] tiles)
    lo_c = rel_p_ref[:, 0:1]
    hi_c = rel_p_ref[:, 1:2]
    rm_c = rel_p_ref[:, 2:3]
    amin_c = ang_p_ref[:, 0:1]
    amax_c = ang_p_ref[:, 1:2]
    am_c = ang_p_ref[:, 2:3]
    cv0_c = clr_p_ref[:, 0:1]
    ctl_c = clr_p_ref[:, 1:2]
    cmn_c = clr_p_ref[:, 2:3]
    cmy_c = clr_p_ref[:, 3:4]
    cMx_c = clr_p_ref[:, 4:5]
    cMy_c = clr_p_ref[:, 5:6]
    cm_c = clr_p_ref[:, 6:7]

    def reflections(x, y, rot):
        """Mirror pose across the symmetry axis (Kernel.cu:290-299); [B,N]."""
        s = 2.0 * (fx * ux + fy * uy - (x * ux + y * uy))
        rx = x + s * ux
        ry = y + s * uy
        rrot = 2.0 * frot - rot
        rrot = jnp.where(rrot < -pi, rrot + 2 * pi, rrot)
        return rx, ry, rrot

    def sym_val(cx, cy, cr, rx, ry, rr):
        """Match score of candidate (c*) vs reflection (r*) — Kernel.cu:301-312.

        One formula shared by the full [B,N,N] evaluation and the
        incremental slab/row updates so recomputed cells are bitwise equal.
        """
        dp = jnp.sqrt(jnp.square(cx - rx) + jnp.square(cy - ry))
        dt = cr - rr
        dt = jnp.where(dt > pi, dt - 2 * pi, dt)
        return 5.0 - jnp.sqrt(dp) - 0.4 * jnp.abs(dt)

    def costs_of(x, y, rot, with_offlimits, with_sym=True, aabbs=None):
        """Weighted breakdown for pose planes x/y/rot of shape [B, N].

        Returns (total[B,1], terms dict of [B,1]). All N x N / C x N terms
        are chain-vectorized 3-D tiles ([B, N, N] / [B, C, N]) — no
        per-chain unrolled loops (those ran ~8x below VPU peak).
        ``aabbs``: precomputed ``obj_aabbs(x, y)`` to share with the
        caller's FIXED-mode off-limits state update.
        """
        xm = x * mask_row
        ym = y * mask_row
        # width-agnostic: the interleaved-streams path (MH_FUSED_STREAMS)
        # evaluates costs on row-slices of the chain block
        bw = x.shape[0]

        # --- entity gathers, ONE batched one-hot matmul per plane ----------
        # rel source/target, angle source/target, and (unrolled path) the
        # clearance parent + parity-anchor one-hots all gather from x and y
        # with static one-hot matrices. Concatenating them row-wise and
        # doing a single [B,N]x[N,M] dot per plane replaces 8 tiny MXU
        # dispatches (plus 8 [B,N] reduce-sums in the unrolled clearance
        # path) with 2 — each output column is an independent dot product,
        # so the gathered values are bitwise-equal to the separate calls.
        # HIGHEST precision throughout: the MXU's default f32 path rounds
        # operands through bf16 (~0.4% rel), which truncates the gathered
        # coordinates — measured up to 1.6 absolute clearance error at
        # piled-up FIXED-mode poses.
        # ONE stacked [3B, N] x [N, M] gather for all three pose planes
        # (x, y, rot) — was three separate HIGHEST-precision MXU dispatches
        # (each 6 passes); the rot rows only contribute the angle-target
        # columns but the extra MXU flops are free (the MXU is idle).
        # Row-slicing [3B, M] at multiples of B keeps sublane alignment.
        # The thin engine gathers TRANSPOSED ([M, bw] per pose plane —
        # entities on sublanes, chains on lanes) so the entity math that
        # follows runs on [E, B] tiles (1 vreg at B = 128) instead of
        # [B, E] tiles (16 vregs each, ~96% dead lanes). THREE separate
        # dots on purpose: a stacked [M, 3bw] output's per-plane column
        # slices sit at lane offset bw, and when bw is not a whole vreg
        # (small chain blocks, e.g. 8-chain tests) Mosaic rejects
        # concatenating those tiles downstream ("result/input offset
        # mismatch on non-concat dimension"); per-plane outputs keep
        # every slice at lane offset 0. The extra MXU dispatches are
        # noise next to the VPU savings.
        if thin:
            g_tx = gather_t(gmat_h, x)  # [M, bw]
            g_ty = gather_t(gmat_h, y)
            g_tr = gather_t(gmat_h, rot)
        else:
            xyr = jnp.concatenate([x, y, rot], axis=0)  # [3B, N]
            g_all3 = onehot_gather(xyr, gmat_h)  # [3B, M]
            gx_all = jax.lax.slice_in_dim(g_all3, 0, bw, axis=0)
            gy_all = jax.lax.slice_in_dim(g_all3, bw, 2 * bw, axis=0)
            gr_all = jax.lax.slice_in_dim(g_all3, 2 * bw, 3 * bw, axis=0)
            atr = gr_all[:, 2 * r_cnt + a_cnt : 2 * r_cnt + 2 * a_cnt]
            sx = gx_all[:, 0:r_cnt]
            sy_ = gy_all[:, 0:r_cnt]
            tx = gx_all[:, r_cnt : 2 * r_cnt]
            ty = gy_all[:, r_cnt : 2 * r_cnt]
            asx = gx_all[:, 2 * r_cnt : 2 * r_cnt + a_cnt]
            asy = gy_all[:, 2 * r_cnt : 2 * r_cnt + a_cnt]
            atx = gx_all[:, 2 * r_cnt + a_cnt : 2 * r_cnt + 2 * a_cnt]
            aty = gy_all[:, 2 * r_cnt + a_cnt : 2 * r_cnt + 2 * a_cnt]
        _clr_off = 2 * r_cnt + 2 * a_cnt

        if thin:
            # === thin-engine entity math: [E, bw] tiles, chains on lanes ===
            # pairwise distance + angle (Kernel.cu:210-263); entity params
            # are [E, 1] columns broadcast over the chain lanes
            if 'rel' in _DEBUG_SKIP:
                pair_t = jnp.zeros((1, bw), jnp.float32)
            else:
                a0 = 2 * r_cnt
                sx = g_tx[0:r_cnt, :]
                sy_ = g_ty[0:r_cnt, :]
                tx = g_tx[r_cnt : 2 * r_cnt, :]
                ty = g_ty[r_cnt : 2 * r_cnt, :]
                d = jnp.sqrt(jnp.square(sx - tx) + jnp.square(sy_ - ty))
                lo_safe = jnp.where(lo_c > 0, lo_c, 1.0)
                d_safe = jnp.where(d > 0, d, 1.0)
                pen = jnp.where(
                    d < lo_c, -jnp.square(d / lo_safe),
                    jnp.where(d > hi_c, -jnp.square(hi_c / d_safe), 0.0),
                )
                pw_t = jnp.sum((pen * rm_c)[None, :, :], axis=1)  # [1,bw]
                asx = g_tx[a0 : a0 + a_cnt, :]
                asy = g_ty[a0 : a0 + a_cnt, :]
                atx = g_tx[a0 + a_cnt : a0 + 2 * a_cnt, :]
                aty = g_ty[a0 + a_cnt : a0 + 2 * a_cnt, :]
                atr = g_tr[a0 + a_cnt : a0 + 2 * a_cnt, :]
                th = theta_fn(asx, asy, atx, aty, atr)
                dev = jnp.minimum(jnp.abs(th - amin_c), jnp.abs(th - amax_c))
                wrap_case = amin_c > amax_c
                norm_wrap = jnp.where(wrap_case, (amin_c - amax_c) / 2.0, 1.0)
                cond_wrap = jnp.mod(amin_c + th, 2 * pi) > amax_c
                npl_raw = (2 * pi - (amax_c - amin_c)) / 2.0
                npl = jnp.where(npl_raw != 0, npl_raw, 1.0)
                if parity:
                    cond_plain = (amin_c < th) | (th < amax_c)
                else:
                    cond_plain = (th < amin_c) | (th > amax_c)
                apen = jnp.where(
                    wrap_case,
                    jnp.where(cond_wrap, -dev / norm_wrap, 0.0),
                    jnp.where(cond_plain, -dev / npl, 0.0),
                )
                pwa_t = jnp.sum((apen * am_c)[None, :, :], axis=1)  # [1,bw]
                # the PairWise x PairWiseAngle product quirk (parity,
                # Kernel.cu:518) / sum (fixed) folds in thin layout
                pair_t = pw_t * pwa_t if parity else pw_t + pwa_t

            # clearance anchors + surface-area outside areas, [Cp, bw]
            cax_t = g_tx[_clr_off : _clr_off + c_cnt_s, :]
            cay_t = g_ty[_clr_off : _clr_off + c_cnt_s, :]
            if 'clr' in _DEBUG_SKIP:
                sa_clr_t = jnp.zeros((1, bw), jnp.float32)
            else:
                if parity:
                    aoff = _clr_off + c_cnt_s
                    pax_t = g_tx[aoff : aoff + c_cnt_s, :]
                    pay_t = g_ty[aoff : aoff + c_cnt_s, :]
                else:
                    pax_t, pay_t = cax_t, cay_t
                sa_mat_t = outside_area(
                    aabb_minx(cv0_c, ctl_c, cmn_c, pax_t),
                    cmy_c + pay_t, cMx_c + pax_t, cMy_c + pay_t,
                )  # [Cp, bw] — padded rows are zeroed by the mask column
                sa_clr_t = -jnp.sum(
                    (sa_mat_t * cm_c)[None, :, :], axis=1
                )  # [1,bw]

            # ONE exact identity-MXU transpose moves the per-chain results
            # back to [bw, K] column layout for the aggregate + the wide
            # clearance-vs-objects tiles
            back = t_cols(
                jnp.concatenate([pair_t, sa_clr_t, cax_t, cay_t], axis=0)
            )  # [bw, 2 + 2*Cp]
            pair_b = back[:, 0:1]
            sa_clr = back[:, 1:2]
            cax_w = back[:, 2 : 2 + c_cnt_s]  # [bw, Cp]
            cay_w = back[:, 2 + c_cnt_s : 2 + 2 * c_cnt_s]
            pw = pwa = None  # unused in thin mode (pair_b carries both)
        # --- pairwise distance (Kernel.cu:210-233) -------------------------
        elif 'rel' in _DEBUG_SKIP:
            pw = jnp.zeros((bw, 1), jnp.float32)
            pwa = jnp.zeros((bw, 1), jnp.float32)
        else:
            lo, hi, rm = lo_h, hi_h, rm_h
            d = jnp.sqrt(jnp.square(sx - tx) + jnp.square(sy_ - ty))
            lo_safe = jnp.where(lo > 0, lo, 1.0)
            d_safe = jnp.where(d > 0, d, 1.0)
            pen = jnp.where(
                d < lo, -jnp.square(d / lo_safe),
                jnp.where(d > hi, -jnp.square(hi / d_safe), 0.0),
            )
            # entity axis is sublane-sized (8): reduce it on sublanes via a
            # [B, R, 1] view — tiny lane-dim reductions miscompile in Mosaic
            pw = jnp.sum((pen * rm)[:, :, None], axis=1)  # [B,1]

            # --- pairwise angle (Kernel.cu:236-263) ------------------------
            amin, amax, am = amin_h, amax_h, am_h
            th = theta_fn(asx, asy, atx, aty, atr)
            dev = jnp.minimum(jnp.abs(th - amin), jnp.abs(th - amax))
            wrap_case = amin > amax
            norm_wrap = jnp.where(wrap_case, (amin - amax) / 2.0, 1.0)
            cond_wrap = jnp.mod(amin + th, 2 * pi) > amax
            npl_raw = (2 * pi - (amax - amin)) / 2.0
            npl = jnp.where(npl_raw != 0, npl_raw, 1.0)
            if parity:
                cond_plain = (amin < th) | (th < amax)
            else:
                cond_plain = (th < amin) | (th > amax)
            apen = jnp.where(
                wrap_case,
                jnp.where(cond_wrap, -dev / norm_wrap, 0.0),
                jnp.where(cond_plain, -dev / npl, 0.0),
            )
            pwa = jnp.sum((apen * am)[:, :, None], axis=1)  # [B,1]

        # --- visual balance (Kernel.cu:191-207) ----------------------------
        if 'vb' in _DEBUG_SKIP:
            vb = jnp.zeros((bw, 1), jnp.float32)
        else:
            area_row = area.reshape(1, n)
            denom = jnp.sum(area_row * mask_row)
            denom = jnp.where(denom > 0, denom, 1.0)
            nx = jnp.sum(area_row * xm, axis=1, keepdims=True) / denom
            ny = jnp.sum(area_row * ym, axis=1, keepdims=True) / denom
            vb = -jnp.sqrt(
                jnp.square(nx - scal_ref[S_CX2])
                + jnp.square(ny - scal_ref[S_CY2])
            )

        # --- focal point (Kernel.cu:266-281) -------------------------------
        # cos(atan2(dy,dx) - rot + pi/2) == (dx*sin(rot) - dy*cos(rot))/r
        # exactly (angle-addition; cos(a)=dx/r, sin(a)=dy/r) — ~12 VPU ops
        # instead of the ~30-op atan2 polynomial + cos. r == 0 (object on
        # the focal point) degenerates to atan2(0,0) == 0 like the
        # reference's atan2f, i.e. cos(-rot + pi/2) == sin(rot).
        if 'fp' in _DEBUG_SKIP:
            fp = jnp.zeros((bw, 1), jnp.float32)
        else:
            dxf = fx - x
            dyf = fy - y
            rf = jnp.sqrt(jnp.square(dxf) + jnp.square(dyf))
            cph = (dxf * jnp.sin(rot) - dyf * jnp.cos(rot)) / jnp.where(
                rf > 0, rf, 1.0
            )
            cph = jnp.where(rf > 0, cph, jnp.sin(rot))
            fp = jnp.sum(-cph * mask_row, axis=1, keepdims=True)

        # off-limits AABBs: computed ONCE and shared by the off-limits,
        # clearance, and surface-area sections (was recomputed per section
        # — 3x the [B, N] plane ops on an issue-bound step)
        omnx, omny, omxx, omxy = (
            aabbs if aabbs is not None else obj_aabbs(x, y)
        )  # [B, N]

        # --- N x N terms, chain-vectorized: symmetry + off-limits ----------
        # [B, N, N] tiles with i (reflection/row) on sublanes, j (candidate)
        # on lanes; per-i results reduce over lanes to [B, N], the i mask is
        # applied in [B, N] layout (avoids any [*, N, 1] mask relayout).
        mask3 = mask.reshape(1, 1, n)  # candidate-j mask
        if 'sym' in _DEBUG_SKIP or not with_sym:
            sym = jnp.zeros((bw, 1), jnp.float32)
        else:
            rx, ry, rrot = reflections(x, y, rot)
            # [b, i, j]: reflection of i vs candidate j
            val = sym_val(
                x[:, None, :], y[:, None, :], rot[:, None, :],
                rx[:, :, None], ry[:, :, None], rrot[:, :, None],
            )
            val = jnp.where(mask3 > 0, val, _NEG_HUGE)
            best = jnp.maximum(jnp.max(val, axis=2), 0.0)  # [B, N]
            sym = -jnp.sum(best * mask_row, axis=1, keepdims=True)

        if 'off' in _DEBUG_SKIP:
            off = jnp.zeros((bw, 1), jnp.float32)
        else:
            if with_offlimits:
                ar = inter_area(
                    omnx[:, :, None], omny[:, :, None],
                    omxx[:, :, None], omxy[:, :, None],
                    omnx[:, None, :], omny[:, None, :],
                    omxx[:, None, :], omxy[:, None, :],
                )  # [B, N, N]
                ii = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
                jj = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
                tri = (jj > ii).astype(jnp.float32)
                off_row = jnp.sum(ar * tri * mask3, axis=2)  # [B, N]
                off = -jnp.sum(off_row * mask_row, axis=1, keepdims=True)
            else:
                off = jnp.zeros((bw, 1), jnp.float32)

        # --- clearance (Kernel.cu:404-434) ---------------------------------
        if thin:
            # thin engine: sa_clr came out of the transposed section above;
            # only the clearance-vs-every-object tiles are inherently wide
            # (clearance rect [bw,1] against the [bw,N] object AABBs)
            clr_sum = jnp.zeros((bw, 1), jnp.float32)
            if 'clr' not in _DEBUG_SKIP:
                if clr_unroll:
                    for c in range(n_clr_real):
                        cv0 = clr_scal_ref[c * 8 + 0]
                        ctl = clr_scal_ref[c * 8 + 1]
                        cmn = clr_scal_ref[c * 8 + 2]
                        cmy = clr_scal_ref[c * 8 + 3]
                        cMx = clr_scal_ref[c * 8 + 4]
                        cMy = clr_scal_ref[c * 8 + 5]
                        cax_c = cax_w[:, c : c + 1]  # [bw,1]
                        cay_c = cay_w[:, c : c + 1]
                        ar = inter_area(
                            aabb_minx(cv0, ctl, cmn, cax_c), cmy + cay_c,
                            cMx + cax_c, cMy + cay_c,
                            omnx, omny, omxx, omxy,
                        )  # [bw, N]
                        clr_sum = clr_sum - jnp.sum(
                            ar * mask_row, axis=1, keepdims=True
                        )
                else:
                    cmnx = aabb_minx(cv0_h, ctl_h, cmn_h, cax_w)  # [bw, Cp]
                    cmny = cmy_h + cay_w
                    cmxx = cMx_h + cax_w
                    cmxy = cMy_h + cay_w
                    ar = inter_area(
                        cmnx[:, :, None], cmny[:, :, None],
                        cmxx[:, :, None], cmxy[:, :, None],
                        omnx[:, None, :], omny[:, None, :],
                        omxx[:, None, :], omxy[:, None, :],
                    )  # [bw, Cp, N]
                    clr_row = jnp.sum(ar * mask.reshape(1, 1, n), axis=2)
                    clr_sum = -jnp.sum((clr_row * cm_h)[:, :, None], axis=1)
        elif 'clr' in _DEBUG_SKIP:
            clr_sum = jnp.zeros((bw, 1), jnp.float32)
            sa_clr = jnp.zeros((bw, 1), jnp.float32)
        elif clr_unroll:
            # few real clearances: unroll them as [B, N] plane math with
            # params from SMEM — ~4x less VPU work than the 8-sublane-
            # padded [B, C, N] tile when only 1-4 clearances are real
            clr_sum = jnp.zeros((bw, 1), jnp.float32)
            sa_clr = jnp.zeros((bw, 1), jnp.float32)
            for c in range(n_clr_real):
                cv0 = clr_scal_ref[c * 8 + 0]
                ctl = clr_scal_ref[c * 8 + 1]
                cmn = clr_scal_ref[c * 8 + 2]
                cmy = clr_scal_ref[c * 8 + 3]
                cMx = clr_scal_ref[c * 8 + 4]
                cMy = clr_scal_ref[c * 8 + 5]
                # parent + anchor translations come out of the batched
                # gather matmul above (columns _clr_off..)
                cax = gx_all[:, _clr_off + c : _clr_off + c + 1]  # [B,1]
                cay = gy_all[:, _clr_off + c : _clr_off + c + 1]
                ar = inter_area(
                    aabb_minx(cv0, ctl, cmn, cax), cmy + cay,
                    cMx + cax, cMy + cay,
                    omnx, omny, omxx, omxy,
                )  # [B, N] broadcast clearance-vs-every-object
                clr_sum = clr_sum - jnp.sum(
                    ar * mask_row, axis=1, keepdims=True
                )
                # surface-area for this clearance rect: parity anchors by
                # clearance index (Kernel.cu:456) — static here
                if parity:
                    a_off = _clr_off + n_clr_real + c
                    pax = gx_all[:, a_off : a_off + 1]
                    pay = gy_all[:, a_off : a_off + 1]
                else:
                    pax, pay = cax, cay
                sa_clr = sa_clr - outside_area(
                    aabb_minx(cv0, ctl, cmn, pax), cmy + pay,
                    cMx + pax, cMy + pay,
                )
        else:
            # many clearances: [B, C] anchor gathers x one [B, C, N] tile
            cax = onehot_gather(x, clr_s_ref[:, :])  # [B, C] anchors
            cay = onehot_gather(y, clr_s_ref[:, :])
            cv0, ctl, cmn = cv0_h, ctl_h, cmn_h
            cmy, cMx, cMy, cm = cmy_h, cMx_h, cMy_h, cm_h
            # clearance AABBs as [B, C] planes, then one [B, C, N] area tile
            cmnx = aabb_minx(cv0, ctl, cmn, cax)  # [B, C]
            cmny = cmy + cay
            cmxx = cMx + cax
            cmxy = cMy + cay
            ar = inter_area(
                cmnx[:, :, None], cmny[:, :, None],
                cmxx[:, :, None], cmxy[:, :, None],
                omnx[:, None, :], omny[:, None, :],
                omxx[:, None, :], omxy[:, None, :],
            )  # [B, C, N]
            clr_row = jnp.sum(ar * mask.reshape(1, 1, n), axis=2)  # [B, C]
            clr_sum = -jnp.sum((clr_row * cm)[:, :, None], axis=1)  # [B,1]

            # surface-area for clearance rects: parity anchors by clearance
            # index (Kernel.cu:456) via the hoisted one-hot gather matmul
            if parity:
                pax = onehot_gather(x, anc_oh)  # [B, C]
                pay = onehot_gather(y, anc_oh)
            else:
                pax, pay = cax, cay
            smnx_c = aabb_minx(cv0, ctl, cmn, pax)
            sa_mat = outside_area(smnx_c, cmy + pay, cMx + pax, cMy + pay)
            sa_clr = -jnp.sum((sa_mat * cm)[:, :, None], axis=1)  # [B,1]

        # --- surface area for object off-limits rects (Kernel.cu:469-480) --
        if 'sa' in _DEBUG_SKIP:
            sa = jnp.zeros((bw, 1), jnp.float32)
        else:
            obj_out = outside_area(omnx, omny, omxx, omxy)
            sa = sa_clr + (
                -jnp.sum(obj_out * mask_row, axis=1, keepdims=True)
            )

        # --- aggregate (Kernel.cu:516-550) ---------------------------------
        if thin:
            pair_w = w_pw * pair_b  # product/sum quirk applied in thin layout
        elif parity:
            pair_w = w_pw * (pw * pwa)
        else:
            pair_w = w_pw * (pw + pwa)
        vb_w = w_vb * vb
        fp_w = w_fp * fp
        sym_w = w_sy * sym
        off_w = w_ol * off
        clr_w = w_cl * clr_sum
        sa_w = w_sa * sa
        # sym is added LAST so the incremental path (which passes
        # with_sym=False and adds w_sy * sym afterwards) produces a
        # bitwise-identical total — acceptance decisions then match the
        # full-recompute path exactly (guarded by a test).
        total = pair_w + vb_w + fp_w + clr_w + sa_w
        if not parity:
            total = total + off_w
        total = total + sym_w
        return total, (pair_w, vb_w, fp_w, sym_w, clr_w, off_w, sa_w)

    # ---- incremental symmetry: per-slab maxima carried in VMEM ----------
    # sm[b, s, i] = max_{j in slab s} val[i, j] (8 candidate columns per
    # slab). A proposal moves <=2 objects, so per step only slab row s(k)
    # (candidate k's column group, all i) and lane k (reflection k's row,
    # all s) change: O(N) work instead of the O(N^2) full matrix. Exact —
    # recomputed cells reuse sym_val and are bitwise equal to a full eval.
    #
    # ``slab_w`` (MH_FUSED_SLABW) sets candidates per slab: wider slabs
    # shrink the carried [B, S, N] state (fewer sublanes per pass) but
    # widen the per-step [B, 2W, N] row eval. PARITY trajectories are
    # W-invariant bitwise (slab maxima re-partition an order-insensitive
    # max); FIXED pair-sum cells re-partition a sum, so W changes FIXED
    # trajectories by reduction order.
    W = slab_w
    S = n // W
    iota_s3 = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1)

    def accept_mask_S(acc_b):
        """[w,1] bool accept mask -> [w,S,1] for slab-state commits.

        Two-stage broadcast on purpose, at EVERY commit site: sublanes
        here (via the constant-true ``iota_s3 >= 0``), lanes inside the
        consuming ``where``. The direct [w,1,1] -> [w,S,N] form can reach
        Mosaic as a single both-dims ``vector.broadcast``, which its
        layout pass rejects ("Not implemented: Broadcast in both sublanes
        and lanes" — crashed every MH_FUSED_SKIP=rng compile until probed
        2026-08-21). Do not "simplify" to ``acc_b[:, :, None]``.
        """
        return acc_b[:, :, None] & (iota_s3 >= 0)
    iota_g3 = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    iota_j3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    slab_mask3 = (
        jax.lax.broadcasted_iota(jnp.int32, (1, S, n), 2) // W
        == jax.lax.broadcasted_iota(jnp.int32, (1, S, n), 1)
    )
    mask3j = mask.reshape(1, 1, n)

    def slab_row_max(slab_i3, x_st, y_st, rot_st, rx_st, ry_st, rrot_st):
        """max_{j in slab} val[i, j] for all rows i — [B, N].

        ``slab_i3``: i32 scalar or [B,1,1] slab index. Gathers the slab's
        W candidate columns with an iota one-hot and evaluates a W-sublane
        [B, W, N] tile.
        """
        candsel = ((iota_g3 + slab_i3 * W) == iota_j3).astype(jnp.float32)
        cx = jnp.sum(candsel * x_st[:, None, :], axis=2)  # [B,W]
        cy = jnp.sum(candsel * y_st[:, None, :], axis=2)
        cr = jnp.sum(candsel * rot_st[:, None, :], axis=2)
        cmsk = jnp.sum(candsel * mask3j, axis=2)
        vs = sym_val(
            cx[:, :, None], cy[:, :, None], cr[:, :, None],
            rx_st[:, None, :], ry_st[:, None, :], rrot_st[:, None, :],
        )  # [B, W, N]
        vs = jnp.where(cmsk[:, :, None] > 0, vs, _NEG_HUGE)
        return jnp.max(vs, axis=1)  # [B, N]

    iota_g16 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * W, 1), 1)

    def dual_slab_row_max(s1_i3, s2_i3, x_st, y_st, rot_st, rx_st, ry_st,
                          rrot_st):
        """Both fresh slab rows in ONE [B,2W,N] evaluation — [B,N] x 2.

        Same element count as two ``slab_row_max`` calls but half the op
        issues (candsel build, 4 gather reductions, sym_val): the kernel is
        issue-bound, so wider tiles at equal element volume are ~free.
        Slots 0..W-1 gather slab ``s1``'s candidates, W..2W-1 slab
        ``s2``'s; the halves reduce separately, so each row is
        bitwise-equal to its single-slab evaluation (max is
        order-insensitive).
        """
        gidx = jnp.where(
            iota_g16 < W,
            s1_i3 * W + iota_g16,
            s2_i3 * W + (iota_g16 - W),
        )  # [B,2W,1]
        candsel = (gidx == iota_j3).astype(jnp.float32)  # [B,2W,N]
        cx = jnp.sum(candsel * x_st[:, None, :], axis=2)  # [B,2W]
        cy = jnp.sum(candsel * y_st[:, None, :], axis=2)
        cr = jnp.sum(candsel * rot_st[:, None, :], axis=2)
        cmsk = jnp.sum(candsel * mask3j, axis=2)
        vs = sym_val(
            cx[:, :, None], cy[:, :, None], cr[:, :, None],
            rx_st[:, None, :], ry_st[:, None, :], rrot_st[:, None, :],
        )  # [B,2W,N]
        vs = jnp.where(cmsk[:, :, None] > 0, vs, _NEG_HUGE)
        half1 = iota_g16 < W
        row1 = jnp.max(jnp.where(half1, vs, _NEG_HUGE), axis=1)
        row2 = jnp.max(jnp.where(half1, _NEG_HUGE, vs), axis=1)
        return row1, row2

    def slab_maxima_init(x, y, rot):
        """Populate sm one slab at a time (fori — keeps VMEM O(B*N))."""
        rx, ry, rrot = reflections(x, y, rot)

        def body(s_i, sm):
            row = slab_row_max(s_i, x, y, rot, rx, ry, rrot)
            return jnp.where(iota_s3 == s_i, row[:, None, :], sm)

        return jax.lax.fori_loop(
            0, S, body, jnp.full((x.shape[0], S, n), _NEG_HUGE, jnp.float32)
        )

    def sym_from_sm(sm):
        best = jnp.maximum(jnp.max(sm, axis=1), 0.0)  # [B, N]
        return -jnp.sum(best * mask_row, axis=1, keepdims=True)

    def off_limits_chunked(x, y):
        """Pairwise off-limits overlap via [B, 8, N] row chunks (fori).

        Replaces the [B, N, N] one-shot evaluation in the final report so
        the kernel's VMEM watermark stays O(B*N) and large chain blocks
        fit. Same masking/triangular semantics as ``costs_of``. Fixed
        8-row chunks — independent of the slab width ``W``.
        """
        omnx, omny, omxx, omxy = obj_aabbs(x, y)  # [B, N]
        iota_c3 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)

        def chunk(c, acc):
            rowsel = ((iota_c3 + 8 * c) == iota_j3).astype(jnp.float32)

            def gath(p):
                return jnp.sum(rowsel * p[:, None, :], axis=2)  # [B,8]

            rmask = jnp.sum(rowsel * mask3j, axis=2)  # [B,8]
            ar = inter_area(
                gath(omnx)[:, :, None], gath(omny)[:, :, None],
                gath(omxx)[:, :, None], gath(omxy)[:, :, None],
                omnx[:, None, :], omny[:, None, :],
                omxx[:, None, :], omxy[:, None, :],
            )  # [B, 8, N]
            tri = (iota_j3 > (iota_c3 + 8 * c)).astype(jnp.float32)  # j > i
            contrib = ar * tri * mask3j * rmask[:, :, None]
            rowsum = jnp.sum(contrib, axis=2)  # [B, 8]
            return acc - jnp.sum(rowsum[:, :, None], axis=1)  # [B, 1]

        return jax.lax.fori_loop(
            0, n // 8, chunk, jnp.zeros((x.shape[0], 1), jnp.float32)
        )

    # ---- incremental off-limits (FIXED mode): per-slab pair sums ---------
    # so[b, s, i] = sum_{j in slab s, j > i} area(o_i, o_j) * mask_j, so
    # off = -sum_i mask_i sum_s so[s, i]. Same update structure as the
    # symmetry maxima: a moved object k invalidates slab row s(k) (all i)
    # and lane k (all s); both are recomputed exactly — no accumulation,
    # no drift. (Sum cells written by the row- vs column-update paths can
    # differ by an ulp — reduction order — so FIXED trajectories are not
    # bitwise-pinned against the full-recompute path the way PARITY's
    # order-insensitive maxima are.)
    def off_slab_row(slab_i3, omnx, omny, omxx, omxy):
        """sum_{j in slab, j>i} area(i, j) for all rows i — [B, N]."""
        candsel = ((iota_g3 + slab_i3 * W) == iota_j3).astype(jnp.float32)

        def gath(p):
            return jnp.sum(candsel * p[:, None, :], axis=2)  # [B,8]

        cmsk = jnp.sum(candsel * mask3j, axis=2)  # [B,8]
        ar = inter_area(
            gath(omnx)[:, :, None], gath(omny)[:, :, None],
            gath(omxx)[:, :, None], gath(omxy)[:, :, None],
            omnx[:, None, :], omny[:, None, :],
            omxx[:, None, :], omxy[:, None, :],
        )  # [B, 8, N] — slab candidate g (as j) vs every i (lanes)
        tri = ((iota_g3 + slab_i3 * W) > iota_j3).astype(jnp.float32)  # j > i
        return jnp.sum(ar * tri * cmsk[:, :, None], axis=1)  # [B, N]

    def off_state_init(x, y):
        omnx, omny, omxx, omxy = obj_aabbs(x, y)

        def body(s_i, so):
            row = off_slab_row(s_i, omnx, omny, omxx, omxy)
            return jnp.where(iota_s3 == s_i, row[:, None, :], so)

        return jax.lax.fori_loop(
            0, S, body, jnp.zeros((x.shape[0], S, n), jnp.float32)
        )

    def off_from_so(so):
        return -jnp.sum(
            jnp.sum(so, axis=1) * mask_row, axis=1, keepdims=True
        )  # [B, 1]

    def so_update(so, sel, x_st, y_st, gate_b):
        """Fold moved object `sel` into the off-limits pair-sum state."""
        kf = jnp.sum(sel * iota_n, axis=1, keepdims=True)
        k_i = kf.astype(jnp.int32)[:, :, None]  # [B,1,1]
        slab_i = k_i // W
        g_on = gate_b[:, :, None] > 0

        omnx, omny, omxx, omxy = obj_aabbs(x_st, y_st)
        new_srow = off_slab_row(slab_i, omnx, omny, omxx, omxy)  # [B,N]
        s_oh = (iota_s3 == slab_i) & g_on
        so = jnp.where(s_oh, new_srow[:, None, :], so)

        # row i = k: sum_{j in s, j > k} area(k, j) for all slabs
        def pick(p):
            return jnp.sum(sel * p, axis=1, keepdims=True)  # [B,1]

        ar_k = inter_area(
            pick(omnx), pick(omny), pick(omxx), pick(omxy),
            omnx, omny, omxx, omxy,
        )  # [B, N] — object k vs every j
        tri_k = (iota_j3[0] > k_i[:, :, 0]).astype(jnp.float32)  # [B,N] j>k
        vrow = ar_k * tri_k * mask_row
        v3 = jnp.where(slab_mask3, vrow[:, None, :], 0.0)  # [B,S,N]
        newcol = jnp.sum(v3, axis=2)  # [B,S]
        l_oh = (sel[:, None, :] > 0) & g_on
        return jnp.where(l_oh, newcol[:, :, None], so)

    def dual_off_slab_row(s1_i3, s2_i3, omnx, omny, omxx, omxy):
        """Both moved objects' pair-sum slab rows in ONE [B,16,N] eval.

        Mirrors ``dual_slab_row_max``: slots 0-7 gather slab ``s1``'s
        candidates, 8-15 slab ``s2``'s; halves reduce separately. Cell
        values equal the single-slab ``off_slab_row`` results (each half's
        masked sum covers the same 8 candidates).
        """
        gidx = jnp.where(
            iota_g16 < W,
            s1_i3 * W + iota_g16,
            s2_i3 * W + (iota_g16 - W),
        )  # [B,16,1]
        candsel = (gidx == iota_j3).astype(jnp.float32)  # [B,16,N]

        def gath(p):
            return jnp.sum(candsel * p[:, None, :], axis=2)  # [B,16]

        cmsk = jnp.sum(candsel * mask3j, axis=2)  # [B,16]
        ar = inter_area(
            gath(omnx)[:, :, None], gath(omny)[:, :, None],
            gath(omxx)[:, :, None], gath(omxy)[:, :, None],
            omnx[:, None, :], omny[:, None, :],
            omxx[:, None, :], omxy[:, None, :],
        )  # [B,16,N] — candidate g (as j) vs every i (lanes)
        tri = (gidx > iota_j3).astype(jnp.float32)  # j > i
        contrib = ar * tri * cmsk[:, :, None]
        half1 = iota_g16 < W
        row1 = jnp.sum(jnp.where(half1, contrib, 0.0), axis=1)  # [B,N]
        row2 = jnp.sum(jnp.where(half1, 0.0, contrib), axis=1)
        return row1, row2

    def so_star_batched(so, sel1, sel2, gate1, gate2, aabbs,
                        s1_i3, s2_i3, stale1, stale2):
        """Fold BOTH moved objects into the off-limits pair-sum state.

        The batched (one [B,16,N] dual row eval + one [B,2S,N] stacked
        column sum) replacement for two sequential ``so_update`` calls —
        FIXED mode alone pays this machinery and measured 42% slower than
        PARITY before (round-4 FIXED addendum). Write order (row2 after
        row1, col2 after col1) matches the sequential path; same-slab /
        same-lane overlap cells hold the same recomputed sums either way.
        ``aabbs``: the star pose's ``obj_aabbs`` (shared with costs_of).
        """
        omnx, omny, omxx, omxy = aabbs
        row1, row2 = dual_off_slab_row(s1_i3, s2_i3, omnx, omny, omxx, omxy)
        so = jnp.where(stale1, row1[:, None, :], so)
        so = jnp.where(stale2, row2[:, None, :], so)

        # column lanes k1/k2: each moved object's own row of pair sums
        sel12 = jnp.concatenate(
            [sel1[:, None, :], sel2[:, None, :]], axis=1
        )  # [B,2,N]
        pk = lambda p: jnp.sum(sel12 * p[:, None, :], axis=2, keepdims=True)
        ar12 = inter_area(
            pk(omnx), pk(omny), pk(omxx), pk(omxy),
            omnx[:, None, :], omny[:, None, :],
            omxx[:, None, :], omxy[:, None, :],
        )  # [B,2,N] — object k_m vs every j
        k12 = jnp.sum(sel12 * iota_n[None, :, :].astype(jnp.float32), axis=2,
                      keepdims=True)  # [B,2,1]
        tri12 = (iota_j3 > k12.astype(jnp.int32)).astype(jnp.float32)
        vrow12 = ar12 * tri12 * mask_row[None, :, :]  # [B,2,N]
        v1 = jax.lax.slice_in_dim(vrow12, 0, 1, axis=1)  # [B,1,N]
        v2 = jax.lax.slice_in_dim(vrow12, 1, 2, axis=1)
        v3 = jnp.concatenate(
            [
                jnp.where(slab_mask3, v1, 0.0),
                jnp.where(slab_mask3, v2, 0.0),
            ],
            axis=1,
        )  # [B,2S,N]
        newcol12 = jnp.sum(v3, axis=2)  # [B,2S]
        newcol1 = jax.lax.slice_in_dim(newcol12, 0, S, axis=1)[:, :, None]
        newcol2 = jax.lax.slice_in_dim(newcol12, S, 2 * S, axis=1)[:, :, None]
        c1 = (sel1[:, None, :] > 0) & (gate1[:, :, None] > 0)  # [B,1,N]
        c2 = (sel2[:, None, :] > 0) & (gate2[:, :, None] > 0)
        so = jnp.where(c1, newcol1, so)
        return jnp.where(c2, newcol2, so)

    def sm_update(sm, sel, x_st, y_st, rot_st, rx_st, ry_st, rrot_st, gate_b):
        """Fold the moved object `sel` (one-hot [B,N]) into sm.

        gate_b f32[B,1]: 1 applies the update, 0 keeps sm (e.g. the second
        swap object on non-swap moves). All inputs are the *star* pose.
        """
        kf = jnp.sum(sel * iota_n, axis=1, keepdims=True)  # [B,1] f32 index
        slab_i = kf.astype(jnp.int32)[:, :, None] // W  # [B,1,1]
        g_on = gate_b[:, :, None] > 0

        # candidate column k changed -> recompute slab row s(k) for all i
        new_srow = slab_row_max(
            slab_i, x_st, y_st, rot_st, rx_st, ry_st, rrot_st
        )
        s_oh = (iota_s3 == slab_i) & g_on  # [B,S,1]
        sm = jnp.where(s_oh, new_srow[:, None, :], sm)

        # reflection row k changed -> recompute lane k for all slabs
        rxk = jnp.sum(sel * rx_st, axis=1, keepdims=True)  # [B,1]
        ryk = jnp.sum(sel * ry_st, axis=1, keepdims=True)
        rrk = jnp.sum(sel * rrot_st, axis=1, keepdims=True)
        vrow = sym_val(x_st, y_st, rot_st, rxk, ryk, rrk)  # [B, N]
        vrow = jnp.where(mask_row > 0, vrow, _NEG_HUGE)
        v3 = jnp.where(slab_mask3, vrow[:, None, :], _NEG_HUGE)  # [B,S,N]
        newcol = jnp.max(v3, axis=2)  # [B, S]
        l_oh = (sel[:, None, :] > 0) & g_on  # [B,1,N]
        return jnp.where(l_oh, newcol[:, :, None], sm)

    def scratch_body(p_s, cur_s, sm_s, so_s, cnt_s):
        # one [B, LANE] random block per call; sw path counts draws in SMEM
        cnt_s[0] = jnp.int32(0)

        def draw_block(transposed=False):
            shape = (LANE, B) if transposed else (B, LANE)
            if 'rng' in _DEBUG_SKIP:
                # anchor the pseudo-draws to a runtime scalar (value still
                # 0.5): fully constant draws fold the one-hot selection
                # indices into a [B,1,1] -> [B,S,N] i32 vector.broadcast
                # with a replicated {*,*} out-layout that crashes Mosaic's
                # layout pass ("Please report a bug", probed 2026-08-21) —
                # this was the round-3 "HTTP-500" remote-compile failure
                return jnp.full(shape, 0.5, jnp.float32) + (
                    seed_ref[0] * 0
                ).astype(jnp.float32)
            if rng_hw:
                return _uniform((B, LANE))  # thin forces the counter stream
            c = cnt_s[0]
            cnt_s[0] = c + 1
            base = (seed_ref[0] * _i32c(0x9E3779B9)) ^ (c * _i32c(0x85EBCA6B))
            return _uniform_sw(
                base, shape, row_offset=first_chain, transposed=transposed
            )

        # all six pose planes live in ONE stacked [6, B, N] scratch
        # (0=x, 1=y, 2=z, 3=rotX, 4=rotY, 5=rotZ — the pose_ref layout):
        # plane-symmetric bookkeeping (swap deltas, accept commit, IO)
        # then runs as single wide ops instead of six thin [B, N] ops.
        # The step is ISSUE-bound (B=64 -> B=128 buys ~0%), so op count —
        # not element count — prices the residual (docs/PERFORMANCE.md,
        # round-3 "Batched materialized commit").
        p_s[:, :, :] = pose_ref[:, :, :]

        # hot-loop totals never touch a [B,N,N] tile: symmetry rides the
        # slab maxima (or a full eval in the non-incremental A/B path) and
        # FIXED-mode off-limits rides the slab pair sums in both paths
        x0, y0, rot0 = p_s[0, :, :], p_s[1, :, :], p_s[4, :, :]
        if incremental:
            sm_s[:, :, :] = slab_maxima_init(x0, y0, rot0)
            t_other, _ = costs_of(x0, y0, rot0, False, with_sym=False)
            total0 = t_other + w_sy * sym_from_sm(sm_s[:, :, :])
        else:
            total0, _ = costs_of(x0, y0, rot0, False)
        if track_off:
            if incremental:
                so_s[:, :, :] = off_state_init(x0, y0)
                off0 = off_from_so(so_s[:, :, :])
            else:
                off0 = off_from_so(off_state_init(x0, y0))
            total0 = total0 + w_ol * off0
        cur_s[:, 0:1] = total0
        cur_s[:, 1:2] = jnp.zeros((B, 1), jnp.float32)  # accept count
        cur_s[:, 2:3] = jnp.zeros((B, 1), jnp.float32)  # log step-scale

        sigx, sigy, sigt = scal_ref[S_SIGX], scal_ref[S_SIGY], scal_ref[S_SIGT]
        scale = scal_ref[S_SCALE]
        adapt_rate, target_acc = scal_ref[S_ADAPTR], scal_ref[S_TARGET]

        def iter_body_multi(t, _):
            """Compound block proposal: ``moves_per_step`` sequential moves,
            one cost evaluation, one accept decision (the deterministic
            equivalent of the reference's blockxDim per-thread proposals,
            ``Kernel.cu:798-828``; same semantics as the XLA engine's
            ``block_propose_from_uniforms``)."""
            x = p_s[0, :, :]
            y = p_s[1, :, :]
            rot = p_s[4, :, :]
            us0 = draw_block()  # dedicated accept draw(s)
            if accept_draws == 1:
                u_acc = us0[:, 1:2]
            else:
                # K independent accept draws (Kernel.cu:819 emulation):
                # accept iff min of K uniforms < ratio
                u_acc = jnp.min(
                    us0[:, 1 : 1 + accept_draws], axis=1, keepdims=True
                )
            gate = jnp.where(has_unfrozen, 1.0, 0.0)
            two_pi = 2.0 * math.pi
            ok_row = okv.reshape(1, n)
            rank_row = rankv.reshape(1, n)
            n_unf_m1 = jnp.maximum(n_unf - 1.0, 0.0)

            scale_b = jnp.exp(cur_s[:, 2:3]) if adapt else scale
            carry0 = (x, y, rot, p_s[2, :, :], p_s[3, :, :], p_s[5, :, :])
            if incremental:
                carry0 = (*carry0, sm_s[:, :, :])
                if track_off:
                    carry0 = (*carry0, so_s[:, :, :])

            def move_body(_m, carry):
                xc, yc, rc, b0, b1, b2 = carry[:6]
                us = draw_block()
                move = jnp.minimum((us[:, 0:1] * 3.0).astype(jnp.int32), 2)
                r1 = jnp.sqrt(-2.0 * jnp.log(us[:, 2:3]))
                r2 = jnp.sqrt(-2.0 * jnp.log(us[:, 4:5]))
                dx = r1 * jnp.cos(two_pi * us[:, 3:4]) * sigx * scale_b
                dy = r1 * jnp.sin(two_pi * us[:, 3:4]) * sigy * scale_b
                drot = r2 * jnp.cos(two_pi * us[:, 5:6]) * sigt * scale_b
                k1 = jnp.minimum(jnp.floor(us[:, 6:7] * n_unf), n_unf_m1) + 1.0
                k2 = jnp.minimum(jnp.floor(us[:, 7:8] * n_unf), n_unf_m1) + 1.0
                sel1 = ((rank_row == k1) & (ok_row > 0)).astype(jnp.float32)
                sel2 = ((rank_row == k2) & (ok_row > 0)).astype(jnp.float32)

                is_t = (move == 0).astype(jnp.float32)
                is_r = (move == 1).astype(jnp.float32)
                is_s = ((move == 2) & (n_objs >= 2)).astype(jnp.float32)

                w_t = is_t * sel1 * gate
                x_n = xc + w_t * (jnp.clip(xc + dx, mnx, mxx) - xc)
                y_n = yc + w_t * (jnp.clip(yc + dy, mny, mxy) - yc)
                wrapped = rc + drot
                wrapped = jnp.where(wrapped < 0, wrapped + 2 * pi, wrapped)
                wrapped = jnp.where(wrapped > 2 * pi, wrapped - 2 * pi, wrapped)
                rot_n = rc + (is_r * sel1 * gate) * (wrapped - rc)

                sw = is_s * gate
                dsel = sel1 - sel2

                def swapped(plane):
                    r1v = jnp.sum(sel1 * plane, axis=1, keepdims=True)
                    r2v = jnp.sum(sel2 * plane, axis=1, keepdims=True)
                    return plane + sw * dsel * (r2v - r1v)

                # on a swap move w_t = is_r = 0, so x_n == xc etc. — one
                # helper swaps pose and aux planes alike
                x_n, y_n, rot_n = swapped(x_n), swapped(y_n), swapped(rot_n)
                b0, b1, b2 = swapped(b0), swapped(b1), swapped(b2)

                out = (x_n, y_n, rot_n, b0, b1, b2)
                if incremental:
                    sm = carry[6]
                    gate1 = jnp.full((B, 1), 1.0, jnp.float32) * gate
                    rx_n, ry_n, rr_n = reflections(x_n, y_n, rot_n)
                    sm = sm_update(
                        sm, sel1, x_n, y_n, rot_n, rx_n, ry_n, rr_n, gate1
                    )
                    sm = sm_update(
                        sm, sel2, x_n, y_n, rot_n, rx_n, ry_n, rr_n, sw
                    )
                    out = (*out, sm)
                    if track_off:
                        so = carry[7]
                        so = so_update(so, sel1, x_n, y_n, gate1)
                        so = so_update(so, sel2, x_n, y_n, sw)
                        out = (*out, so)
                return out

            carry = jax.lax.fori_loop(0, moves_per_step, move_body, carry0)
            x_star, y_star, rot_star, a0s, a1s, a2s = carry[:6]

            if incremental:
                sm_star = carry[6]
                t_other, _ = costs_of(
                    x_star, y_star, rot_star, False, with_sym=False
                )
                total_star = t_other + w_sy * sym_from_sm(sm_star)
            else:
                total_star, _ = costs_of(x_star, y_star, rot_star, False)
            if track_off:
                if incremental:
                    so_star = carry[7]
                    off_star = off_from_so(so_star)
                else:
                    off_star = off_from_so(off_state_init(x_star, y_star))
                total_star = total_star + w_ol * off_star

            cur = cur_s[:, 0:1]
            ratio = jnp.exp(jnp.minimum(beta * (total_star - cur), 0.0))
            acc_b = (u_acc < ratio) & (gate > 0)
            acc = acc_b.astype(jnp.float32)

            star_stack = jnp.concatenate(
                [v[None, :, :] for v in
                 (x_star, y_star, a0s, a1s, rot_star, a2s)], axis=0
            )  # [6, B, N] in pose-plane order
            p_s[:, :, :] = jnp.where(
                acc_b[None, :, :], star_stack, p_s[:, :, :]
            )
            if incremental:
                accS_m = accept_mask_S(acc_b)
                sm_s[:, :, :] = jnp.where(accS_m, sm_star, sm_s[:, :, :])
                if track_off:
                    so_s[:, :, :] = jnp.where(accS_m, so_star, so_s[:, :, :])
            cur_s[:, 0:1] = jnp.where(acc_b, total_star, cur)
            cur_s[:, 1:2] = cur_s[:, 1:2] + acc
            if adapt:
                cur_s[:, 2:3] = cur_s[:, 2:3] + adapt_rate * (
                    acc - target_acc
                )
            return 0

        def one_step(us, active, s0=0, w=None):
            """One MH iteration driven by a pre-drawn random block ``us``
            — [w, lanes] wide layout, or TRANSPOSED [lanes, w] under the
            thin engine (lanes = 8, or 8 + K for accept_draws == K). The
            caller amortizes one [B, LANE]-sized counter draw over
            LANE//lanes steps via static slices — the per-iteration
            random-bit volume was ~14% of the headline step time when
            drawn per step (MH_FUSED_SKIP=rng ablation, 2026-08-20).

            ``active`` (traced scalar bool) gates acceptance: the dynamic
            iteration count rounds up to whole draw blocks, and the tail
            steps past the requested count must not commit state (they
            still burn a few step-evals, <=unroll-1 of them total).

            ``s0``/``w`` select a chain-row slice [s0, s0+w) of the block
            (MH_FUSED_STREAMS interleaving): every op below is elementwise
            along the chain axis (reductions run over lanes/objects only),
            so a sliced step is bitwise-identical to the full-width one —
            but steps of DISJOINT slices are data-independent, which hands
            the Mosaic scheduler cross-stream ILP the serialized
            step-dependency chain otherwise hides."""
            if w is None:
                w = B
            ps = p_s[:, s0 : s0 + w, :]  # [6, w, N] pose planes, one load
            x = ps[0]
            y = ps[1]
            rot = ps[4]

            two_pi = 2.0 * math.pi
            if thin:
                # === thin proposal scalars: draw rows [lanes, w] (chains
                # on lanes), whole chain [1, w] ops at 1 vreg each, then
                # ONE exact identity-MXU transpose back to [w, 1] columns
                move_t = jnp.minimum(
                    (us[0:1, :] * 3.0).astype(jnp.int32), 2
                )  # [1,w]
                if accept_draws == 1:
                    u_acc_t = us[1:2, :]
                else:
                    # rows 8..8+K are untouched by the proposal (rows 0-7
                    # drive it), so the K accept draws stay independent
                    u_acc_t = jnp.min(
                        us[8 : 8 + accept_draws, :][None, :, :], axis=1
                    )  # [1,w]
                if adapt:
                    scale_t = jnp.exp(t_row(cur_s[s0 : s0 + w, 2:3]))
                else:
                    scale_t = scale
                r1 = jnp.sqrt(-2.0 * jnp.log(us[2:3, :]))
                r2 = jnp.sqrt(-2.0 * jnp.log(us[4:5, :]))
                dx_t = r1 * jnp.cos(two_pi * us[3:4, :]) * sigx * scale_t
                dy_t = r1 * jnp.sin(two_pi * us[3:4, :]) * sigy * scale_t
                drot_t = r2 * jnp.cos(two_pi * us[5:6, :]) * sigt * scale_t
                n_unf_m1 = jnp.maximum(n_unf - 1.0, 0.0)
                k1_t = jnp.minimum(
                    jnp.floor(us[6:7, :] * n_unf), n_unf_m1
                ) + 1.0
                k2_t = jnp.minimum(
                    jnp.floor(us[7:8, :] * n_unf), n_unf_m1
                ) + 1.0
                is_t_t = (move_t == 0).astype(jnp.float32)
                is_r_t = (move_t == 1).astype(jnp.float32)
                is_s_t = ((move_t == 2) & (n_objs >= 2)).astype(jnp.float32)
                backp = t_cols(
                    jnp.concatenate(
                        [u_acc_t, dx_t, dy_t, drot_t, k1_t, k2_t,
                         is_t_t, is_r_t, is_s_t],
                        axis=0,
                    )
                )  # [w, 9]
                u_acc = backp[:, 0:1]
                dx = backp[:, 1:2]
                dy = backp[:, 2:3]
                drot = backp[:, 3:4]
                k1 = backp[:, 4:5]
                k2 = backp[:, 5:6]
                is_t = backp[:, 6:7]
                is_r = backp[:, 7:8]
                is_s = backp[:, 8:9]
            else:
                move = jnp.minimum(
                    (us[:, 0:1] * 3.0).astype(jnp.int32), 2
                )  # [w,1]
                if accept_draws == 1:
                    u_acc = us[:, 1:2]
                else:
                    # lanes 8..8+K are untouched by the proposal (lanes 0-7
                    # drive it), so the K accept draws stay independent of it
                    u_acc = jnp.min(
                        us[:, 8 : 8 + accept_draws], axis=1, keepdims=True
                    )
                scale_b = jnp.exp(cur_s[s0 : s0 + w, 2:3]) if adapt else scale
                r1 = jnp.sqrt(-2.0 * jnp.log(us[:, 2:3]))
                r2 = jnp.sqrt(-2.0 * jnp.log(us[:, 4:5]))
                dx = r1 * jnp.cos(two_pi * us[:, 3:4]) * sigx * scale_b
                dy = r1 * jnp.sin(two_pi * us[:, 3:4]) * sigy * scale_b
                drot = r2 * jnp.cos(two_pi * us[:, 5:6]) * sigt * scale_b

            # Uniform pick among movable objects via rank match: draw a
            # 1-based rank k in [1, n_unf] and one-hot the object whose
            # precomputed cumulative rank equals k. Ranks are small integers
            # stored exactly in f32, so equality compare is exact. Frozen
            # lanes share a rank with their predecessor and padded lanes hold
            # rank 0 (pack_scene zero-pads the cumsum); k >= 1 plus the ok
            # gate keeps both out. Replaces a [B, 2N] gumbel-max (two log-log
            # passes + row max-reductions) with two scalar lanes of `us`.
            if not thin:
                n_unf_m1 = jnp.maximum(n_unf - 1.0, 0.0)
                k1 = jnp.minimum(jnp.floor(us[:, 6:7] * n_unf), n_unf_m1) + 1.0
                k2 = jnp.minimum(jnp.floor(us[:, 7:8] * n_unf), n_unf_m1) + 1.0
                is_t = (move == 0).astype(jnp.float32)
                is_r = (move == 1).astype(jnp.float32)
                is_s = ((move == 2) & (n_objs >= 2)).astype(jnp.float32)
            ok_row = okv.reshape(1, n)
            rank_row = rankv.reshape(1, n)
            sel1 = ((rank_row == k1) & (ok_row > 0)).astype(jnp.float32)
            sel2 = ((rank_row == k2) & (ok_row > 0)).astype(jnp.float32)

            # translate/rotate deltas are plane-specific [B, N] math...
            w_t = is_t * sel1
            tdx = w_t * (jnp.clip(x + dx, mnx, mxx) - x)
            tdy = w_t * (jnp.clip(y + dy, mny, mxy) - y)
            wrapped = rot + drot
            wrapped = jnp.where(wrapped < 0, wrapped + 2 * pi, wrapped)
            wrapped = jnp.where(wrapped > 2 * pi, wrapped - 2 * pi, wrapped)
            tdr = (is_r * sel1) * (wrapped - rot)

            # ...but the swap delta, the frozen gate, and the star pose are
            # plane-symmetric: ONE [6, B, N] op chain covers all six planes
            # (incl. the z/rotX/rotZ aux planes only swaps touch) instead
            # of 6x thin [B, N] ops — the issue-bound step prices op count.
            sw = is_s * jnp.where(has_unfrozen, 1.0, 0.0)
            dsel = sel1 - sel2
            r1v = jnp.sum(sel1[None, :, :] * ps, axis=2, keepdims=True)
            r2v = jnp.sum(sel2[None, :, :] * ps, axis=2, keepdims=True)
            zero_d = jnp.zeros((1, w, n), jnp.float32)
            tdelta = jnp.concatenate(
                [tdx[None], tdy[None], zero_d, zero_d, tdr[None], zero_d],
                axis=0,
            )  # [6, B, N]
            gate = jnp.where(has_unfrozen, 1.0, 0.0)
            star = ps + gate * (
                tdelta + (sw * dsel)[None, :, :] * (r2v - r1v)
            )  # [6, B, N]
            x_star = star[0]
            y_star = star[1]
            rot_star = star[4]

            gate1 = jnp.full((w, 1), 1.0, jnp.float32) * gate
            ab_star = obj_aabbs(x_star, y_star) if track_off else None
            if incremental:
                # shared symmetry prelude for both commit variants: one
                # [B,16,N] dual-slab row eval, and BOTH moved lanes' value
                # rows in one [B,2,N] sym_val chain (was two sequential
                # [B,N] evals — the issue-bound step prices op count)
                rx_st, ry_st, rrot_st = reflections(x_star, y_star, rot_star)
                s1_i = (
                    jnp.sum(sel1 * iota_n, axis=1, keepdims=True)
                ).astype(jnp.int32)[:, :, None] // W  # [w,1,1]
                s2_i = (
                    jnp.sum(sel2 * iota_n, axis=1, keepdims=True)
                ).astype(jnp.int32)[:, :, None] // W
                g1_on = gate1[:, :, None] > 0  # [w,1,1]
                g2_on = sw[:, :, None] > 0
                row1, row2 = dual_slab_row_max(
                    s1_i, s2_i, x_star, y_star, rot_star,
                    rx_st, ry_st, rrot_st,
                )  # [w,N] x 2
                sel12 = jnp.concatenate(
                    [sel1[:, None, :], sel2[:, None, :]], axis=1
                )  # [w,2,N]
                rxk = jnp.sum(sel12 * rx_st[:, None, :], axis=2, keepdims=True)
                ryk = jnp.sum(sel12 * ry_st[:, None, :], axis=2, keepdims=True)
                rrk = jnp.sum(sel12 * rrot_st[:, None, :], axis=2, keepdims=True)
                v12 = sym_val(
                    x_star[:, None, :], y_star[:, None, :],
                    rot_star[:, None, :], rxk, ryk, rrk,
                )  # [w,2,N]
                v12 = jnp.where(mask3j > 0, v12, _NEG_HUGE)
                # keep the [B,1,N] slice forms: every consumer broadcasts
                # over sublanes or reduces axis 2, so no squeeze is needed
                v1_3 = jax.lax.slice_in_dim(v12, 0, 1, axis=1)  # [w,1,N]
                v2_3 = jax.lax.slice_in_dim(v12, 1, 2, axis=1)
                stale1 = (iota_s3 == s1_i) & g1_on  # [w,S,1]
                stale2 = (iota_s3 == s2_i) & g2_on
            if incremental:
                # Materialized incremental symmetry (round-1 semantics):
                # build sm_star before the accept decision, commit with ONE
                # [B,S,N] select. (A deferred-commit variant that skipped
                # materializing sm_star existed as MH_FUSED_DEFER=1; it
                # traded fewer pre-accept passes for ~3 extra total tile
                # passes and measured 0.125 vs 0.097 ms/step — the step is
                # throughput-bound, so total passes price it. Deleted
                # round 5; post-mortem in docs/PERFORMANCE.md round-3.)
                #
                # Both moved objects' evaluations are batched: the dual-slab
                # row eval above plus one [B,2S,N] stacked segmented column
                # max, instead of two sequential sm_update calls.
                # Bitwise-equal to the sequential order: every cell both
                # paths touch is a max over the same one-hot-gathered values
                # (the overlap cell [s2, lane1] is max_{j in s2} val[k1, j]
                # either way — max is order-insensitive), pinned by the
                # bitwise-vs-full-recompute test.
                #
                # rows: moved candidates' slabs recomputed for all lanes.
                # Write row2 after row1 (same-slab cells agree bitwise:
                # both rows are the same slab's max at the star pose).
                sm_star = jnp.where(stale1, row1[:, None, :], sm_s[s0 : s0 + w, :, :])
                sm_star = jnp.where(stale2, row2[:, None, :], sm_star)
                # columns: both moved lanes' per-slab maxima in one
                # [B,2S,N] masked reduction (axis 2)
                v3 = jnp.concatenate(
                    [
                        jnp.where(slab_mask3, v1_3, _NEG_HUGE),
                        jnp.where(slab_mask3, v2_3, _NEG_HUGE),
                    ],
                    axis=1,
                )  # [w,2S,N]
                newcol12 = jnp.max(v3, axis=2)  # [w,2S]
                # static lane slices + [:, :, None] expansion (a combined
                # `[:, :S, None]` getitem lowers to a Mosaic-rejected gather)
                newcol1 = jax.lax.slice_in_dim(newcol12, 0, S, axis=1)[:, :, None]
                newcol2 = jax.lax.slice_in_dim(newcol12, S, 2 * S, axis=1)[:, :, None]
                c1 = (sel1[:, None, :] > 0) & g1_on  # [w,1,N]
                c2 = (sel2[:, None, :] > 0) & g2_on
                sm_star = jnp.where(c1, newcol1, sm_star)
                sm_star = jnp.where(c2, newcol2, sm_star)
                t_other, _ = costs_of(
                    x_star, y_star, rot_star, False, with_sym=False,
                    aabbs=ab_star,
                )
                total_star = t_other + w_sy * sym_from_sm(sm_star)
            else:
                total_star, _ = costs_of(
                    x_star, y_star, rot_star, False, aabbs=ab_star
                )
            if track_off:
                if incremental:
                    # batched dual update (one [w,16,N] row eval + one
                    # [w,2S,N] stacked column sum) — FIXED alone pays the
                    # off-limits state machinery, and the two sequential
                    # so_update calls priced it 42% over PARITY (r4);
                    # reuses the symmetry prelude's slab indices/masks
                    # and the star AABBs costs_of already needed
                    so_star = so_star_batched(
                        so_s[s0 : s0 + w, :, :], sel1, sel2, gate1, sw,
                        ab_star, s1_i, s2_i, stale1, stale2,
                    )
                    off_star = off_from_so(so_star)
                else:
                    off_star = off_from_so(off_state_init(x_star, y_star))
                total_star = total_star + w_ol * off_star
            cur = cur_s[s0 : s0 + w, 0:1]
            ratio = jnp.exp(jnp.minimum(beta * (total_star - cur), 0.0))
            acc_b = (u_acc < ratio) & (gate > 0) & active  # [w,1] bool
            acc = acc_b.astype(jnp.float32)

            # where-selects keep the stored state bitwise equal to the star
            # pose on acceptance (an arithmetic blend x+acc*(star-x) can be
            # off by an ulp, which would desync the carried slab maxima).
            # ONE stacked [6,B,N] select commits every plane — the aux
            # (z/rotX/rotZ) swap deltas are already inside `star`.
            p_s[:, s0 : s0 + w, :] = jnp.where(acc_b[None, :, :], star, ps)
            accS = accept_mask_S(acc_b)  # [w,S,1]
            if incremental:
                sm_s[s0 : s0 + w, :, :] = jnp.where(
                    accS, sm_star, sm_s[s0 : s0 + w, :, :]
                )
                if track_off:
                    so_s[s0 : s0 + w, :, :] = jnp.where(
                        accS, so_star, so_s[s0 : s0 + w, :, :]
                    )
            cur_s[s0 : s0 + w, 0:1] = jnp.where(acc_b, total_star, cur)
            cur_s[s0 : s0 + w, 1:2] = cur_s[s0 : s0 + w, 1:2] + acc
            if adapt:
                # phantom tail steps (active=False) must not move the
                # Robbins-Monro state either
                cur_s[s0 : s0 + w, 2:3] = cur_s[s0 : s0 + w, 2:3] + jnp.where(
                    active, adapt_rate * (acc - target_acc), 0.0
                )

        # iteration count is a RUNTIME scalar (SMEM prefetch): one compiled
        # executable serves every chain-length — a compile takes 1-3 min
        # over the TPU tunnel and the old static count recompiled per
        # length (3x per linearity fit, once per budget change in serving)
        it_count = seed_ref[1]
        if moves_per_step == 1:
            # Amortize one [B, LANE] on-chip PRNG draw over `unroll` MH
            # steps (static lane slices; the steps stay sequentially
            # dependent through the accepted state, only the random-bit
            # generation is batched). MH_FUSED_UNROLL overrides.
            lanes = 8 if accept_draws == 1 else 8 + accept_draws
            # default unroll 4 (was LANE//lanes = 16): measured within
            # noise of 16 at the headline shape (0.105 vs 0.105-0.110
            # ms/step) while compiling ~3x faster — Mosaic compile time
            # grows ~3x per unroll doubling (docs/PERFORMANCE.md round-4
            # "compile pathology"), and the counter RNG stream has no
            # per-draw state to amortize.
            unroll = min(4, max(1, LANE // lanes))
            env_unroll = os.environ.get("MH_FUSED_UNROLL", "")
            if env_unroll:
                unroll = max(1, min(int(env_unroll), LANE // lanes))

            # MH_FUSED_STREAMS=G splits the block into G independent
            # row-slices whose serialized step chains interleave in one
            # basic block: stream g's step j+1 depends only on ITS step j,
            # so the scheduler can overlap the G dependency chains (the
            # step is latency-bound along its op chain — the ablation
            # shares are additive; docs/PERFORMANCE.md round-4). Bitwise
            # identical to G=1: the RNG block is drawn full-width and each
            # chain row sees the same values either way.
            streams = 1
            env_streams = os.environ.get("MH_FUSED_STREAMS", "")
            if env_streams and not thin:
                # the thin engine runs full-width (its identity-transpose
                # matrices are sized to B); streams lost at every width
                # anyway (docs/PERFORMANCE.md round-4)
                streams = max(1, int(env_streams))
            while streams > 1 and (B % streams or (B // streams) % 8):
                streams //= 2
            sw_ = B // streams

            def iter_block(t, _):
                us_blk = draw_block(transposed=thin)
                base = t * unroll
                for j in range(unroll):
                    act = base + j < it_count
                    if thin:
                        one_step(
                            us_blk[j * lanes : j * lanes + lanes, :], act
                        )
                        continue
                    for g in range(streams):
                        one_step(
                            us_blk[
                                g * sw_ : (g + 1) * sw_,
                                j * lanes : j * lanes + lanes,
                            ],
                            act,
                            s0=g * sw_,
                            w=sw_,
                        )
                return 0

            n_blocks = (it_count + unroll - 1) // unroll
            jax.lax.fori_loop(0, n_blocks, iter_block, 0)
        else:
            jax.lax.fori_loop(0, it_count, iter_body_multi, 0)

        # final breakdown for reporting. Symmetry comes from the carried
        # slab maxima when incremental (bitwise-equal to a full eval);
        # OffLimits is always re-evaluated chunked ([B,8,N] fori) so the
        # kernel's VMEM watermark stays O(B*N) at any block size.
        xf, yf, rotf = p_s[0, :, :], p_s[1, :, :], p_s[4, :, :]
        if incremental:
            t_nosym, terms = costs_of(xf, yf, rotf, False, with_sym=False)
            sym_w = w_sy * sym_from_sm(sm_s[:, :, :])
            total = t_nosym + sym_w
        else:
            total, terms = costs_of(xf, yf, rotf, False)
            sym_w = terms[3]
        pair_w, vb_w, fp_w, _sym0, clr_w, off_w, sa_w = terms
        # the final OffLimits report ablates under its own flag ('off'),
        # not the symmetry skip flag (round-1 copy-paste fix)
        if report_offlimits and 'off' not in _DEBUG_SKIP:
            off_w = w_ol * off_limits_chunked(xf, yf)
            if not parity:
                total = total + off_w

        pose_out_ref[:, :, :] = p_s[:, :, :]

        # per-lane stores, not a concatenate: Mosaic rejects concatenating
        # [B,1] values whose producers left them on different vreg offsets
        # ("result/input offset mismatch on non-concat dimension" — hit
        # when the VPU gather path changed sa_w's layout); stores relayout
        stats_ref[:, :] = jnp.zeros((B, LANE), jnp.float32)
        for lane, v in enumerate(
            (total, pair_w, vb_w, fp_w, sym_w, clr_w, off_w, sa_w,
             cur_s[:, 1:2], jnp.exp(cur_s[:, 2:3]))
        ):
            stats_ref[:, lane : lane + 1] = v

    pl.run_scoped(
        scratch_body,
        p_s=pltpu.VMEM((6, B, n), jnp.float32),
        cur_s=pltpu.VMEM((B, LANE), jnp.float32),
        sm_s=pltpu.VMEM((B, n // slab_w, n), jnp.float32),
        so_s=pltpu.VMEM((B, n // slab_w, n), jnp.float32),
        cnt_s=pltpu.SMEM((1,), jnp.int32),
    )


# jitted runner per static configuration: a bare pallas_call re-traces and
# re-lowers the (large) kernel on EVERY invocation — measured ~840 ms of
# host-side overhead per call at the headline config vs ~25 ms executable
# dispatch once cached (docs/PERFORMANCE.md). Scene contents are traced
# ARGUMENTS, so one runner serves every scene with the same padded shapes.
_RUNNER_CACHE: dict = {}


def _fused_runner(
    *,
    n: int,
    n0: int,
    n_chains: int,
    bc: int,
    mode: CostMode,
    rng_hw: bool,
    thin: bool,
    slab_w: int,
    track_off: bool,
    incremental: bool,
    moves_per_step: int,
    adapt: bool,
    accept_draws: int,
    clr_unroll: bool,
    n_clr_real: int,
    clr_anchors: tuple,
    interpret: bool,
    vmem_bytes: int,
    rel_shape: tuple,
    relp_shape: tuple,
    ang_shape: tuple,
    angp_shape: tuple,
    clr_shape: tuple,
    clrp_shape: tuple,
):
    grid = (n_chains // bc,)
    rep = lambda *_: (0, 0)  # replicated 2-D scene inputs

    kernel = functools.partial(
        _fused_kernel,
        mode=mode,
        thin=thin,
        slab_w=slab_w,
        track_off=track_off,
        n=n,
        report_offlimits=True,
        incremental=incremental,
        moves_per_step=moves_per_step,
        adapt=adapt,
        accept_draws=accept_draws,
        clr_unroll=clr_unroll,
        n_clr_real=n_clr_real,
        clr_anchors=clr_anchors,
        # the counter-based stream (default) is pure jnp/lax, so interpret
        # and compiled runs share ONE stream keyed by global chain id;
        # rng_hw is force-disabled under the interpreter (no prng_* lowering)
        rng_hw=rng_hw and not interpret,
    )
    call = pl.pallas_call(
        kernel,
        interpret=interpret,
        # pose planes alias in->out (operand index includes the three
        # scalar-prefetch operands): halves the double-buffered pose VMEM
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_bytes,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # seed + scalars + clr params in SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (6, bc, n), lambda g, *_: (0, g, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((N_PLANES, n), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec(rel_shape, rep, memory_space=pltpu.VMEM),
                pl.BlockSpec(rel_shape, rep, memory_space=pltpu.VMEM),
                pl.BlockSpec(relp_shape, rep, memory_space=pltpu.VMEM),
                pl.BlockSpec(ang_shape, rep, memory_space=pltpu.VMEM),
                pl.BlockSpec(ang_shape, rep, memory_space=pltpu.VMEM),
                pl.BlockSpec(angp_shape, rep, memory_space=pltpu.VMEM),
                pl.BlockSpec(clr_shape, rep, memory_space=pltpu.VMEM),
                pl.BlockSpec(clrp_shape, rep, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(
                    (6, bc, n), lambda g, *_: (0, g, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bc, LANE), lambda g, *_: (g, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((6, n_chains, n), jnp.float32),
            jax.ShapeDtypeStruct((n_chains, LANE), jnp.float32),
        ],
    )

    @jax.jit
    def runner(seed_arr, scalars, clr_scal, p0, planes, rs, rt, rp, a_s, a_t,
               a_p, cs, cp):
        pose_planes = jnp.zeros((6, n_chains, n), jnp.float32)
        pose_planes = pose_planes.at[:, :, :n0].set(jnp.transpose(p0, (2, 0, 1)))
        pose_out, stats = call(
            seed_arr, scalars, clr_scal, pose_planes, planes, rs, rt, rp,
            a_s, a_t, a_p, cs, cp,
        )
        pose = jnp.transpose(pose_out[:, :, :n0], (1, 2, 0))  # [C, N0, 6]
        return (
            pose, stats[:, :8], stats[:, 8].astype(jnp.int32), stats[:, 9]
        )

    return runner


def run_chains_fused(
    seed: Array,
    pose0: Array,
    scene: Scene,
    cfg: SamplerConfig,
    n_chains: int,
    iterations: int,
    interpret: bool = False,
    incremental: bool | None = None,
    bc_override: int | None = None,
):
    """Run ``n_chains`` MH chains fully fused on-chip.

    Returns ``(pose f32[n_chains, N0, 6], breakdown f32[n_chains, 8],
    n_accept i32[n_chains], step_scale f32[n_chains])`` where N0 is the
    scene's padded object count; ``step_scale`` is the final adapted
    step-size scale (1.0 when ``cfg.adapt`` is off).
    Chains are grouped in blocks of ``block_chains(n)`` per grid step.

    ``incremental`` (default on; env ``MH_FUSED_INCREMENTAL=0`` disables):
    carry per-slab maxima of the symmetry match matrix in VMEM and update
    only the <=2 moved objects' row/column groups per step — exact O(N)
    replacement for the O(N^2) term (Kernel.cu:283-318), viable only
    on-chip (the XLA-level variant loses 140x to HBM traffic, see
    docs/PERFORMANCE.md).

    The scene is packed on host (numpy, ~1 ms) per call; the compiled
    program is fetched from a per-shape runner cache, so repeat calls cost
    one executable dispatch (the first call per configuration traces and
    compiles once).

    Self-protecting block sizing: the chain block starts from
    ``block_chains(n)``, is pre-shrunk against a scoped-VMEM estimate
    (``fused_vmem_estimate``), and — should the compiler still OOM — is
    halved (then the VMEM limit raised) and retried until it compiles.
    The proven (block, vmem) is persisted per shape so later processes
    skip the failed compile. ``bc_override`` disables the retry (an
    explicit block is a contract, e.g. for device-count invariance).
    """
    n0 = scene.n_pad_objs
    p0 = pose0 if pose0.ndim == 3 else jnp.broadcast_to(pose0, (n_chains, n0, 6))

    def invoke(runner, packed, bc):
        return runner(
            jnp.asarray([seed, iterations, 0], jnp.int32),
            *_runner_args(packed, p0),
        )

    return _call_fused_protected(
        invoke, scene, cfg, n_chains, interpret, incremental,
        bc_override,
    )


def _is_vmem_oom(e: Exception) -> bool:
    msg = str(e)
    return ("vmem" in msg.lower() and "out of memory" in msg.lower()) or (
        "scoped vmem limit" in msg.lower()
    )


def _scene_track_off(scene: Scene, cfg: SamplerConfig) -> bool:
    """FIXED-mode off-limits state is compiled in iff the scene weights it."""
    return cfg.mode is not CostMode.PARITY and bool(
        abs(float(np.asarray(scene.w_offlimits))) > 0.0
    )


def _resolve_incremental(incremental: bool | None) -> bool:
    if incremental is None:
        incremental = os.environ.get("MH_FUSED_INCREMENTAL", "1") != "0"
    return incremental and "sym" not in _DEBUG_SKIP


def _call_fused_protected(
    invoke, scene, cfg, n_chains, interpret, incremental,
    bc_override,
):
    """Run ``invoke(runner, packed)``, halving the chain block (then raising
    the scoped-VMEM limit) and retrying on a Mosaic scoped-VMEM OOM."""
    incremental = _resolve_incremental(incremental)
    bc_req, vmem_req = bc_override, None
    while True:
        runner, packed, bc, vmem = _get_runner(
            scene, cfg, n_chains, interpret, incremental,
            bc_req, vmem_override=vmem_req,
        )
        try:
            out = invoke(runner, packed, bc)
        except Exception as e:  # noqa: BLE001 — filtered just below
            if interpret or bc_override is not None or not _is_vmem_oom(e):
                raise
            if bc > _BC_FLOOR:
                bc_req, vmem_req = bc // 2, vmem
            elif vmem < MAX_VMEM:
                bc_req, vmem_req = bc, min(vmem * 2, MAX_VMEM)
            else:
                raise
            import warnings

            warnings.warn(
                f"fused kernel scoped-VMEM OOM at block={bc}, "
                f"vmem={vmem >> 20}M; retrying with block={bc_req}, "
                f"vmem={vmem_req >> 20}M",
                stacklevel=2,
            )
            continue
        if (
            not interpret
            and bc_override is None
            # env-override runs (block/vmem sweeps) must not record fits:
            # the sidecar key is read by DEFAULT-config calls, and a fit
            # proven under e.g. MH_FUSED_VMEM=96M would silently pin the
            # production scoped-VMEM request (the ADVICE r3 poisoning
            # class; MH_FUSED_BLOCK also shifts the pref key itself)
            and "MH_FUSED_BLOCK" not in os.environ
            and "MH_FUSED_VMEM" not in os.environ
        ):
            _record_fit(packed.n, cfg, incremental, n_chains, bc, vmem,
                        _scene_track_off(scene, cfg))
        return out


def _runner_args(packed: PackedScene, p0: Array) -> tuple:
    return (
        packed.scalars,
        packed.clr_scal,
        p0,
        packed.planes,
        packed.rel_src_oh,
        packed.rel_tgt_oh,
        packed.rel_params,
        packed.ang_src_oh,
        packed.ang_tgt_oh,
        packed.ang_params,
        packed.clr_src_oh,
        packed.clr_params,
    )


# (block, vmem) pairs proven to compile at a given shape — in-memory plus a
# best-effort JSON sidecar next to the JAX compilation cache, so a process
# that follows a compile-failure retry starts from the proven fit instead
# of re-paying the failed compile.
_FIT_CACHE: dict = {}
_FIT_PATH = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), "mh_tpu_fused_fit_v2.json"
)
_FIT_LOADED = False


def _fit_key(n: int, cfg: SamplerConfig, incremental: bool,
             n_chains: int, track_off: bool = True) -> str:
    # n_chains is part of the key: the chain block is clamped to the chain
    # count, so a small run (e.g. an 8-chain test at the same padded scene
    # size) must not record its tiny block as "proven" for a 1024-chain
    # production call — that poisoning cost 1.7x at the headline shape.
    # every A/B env knob that changes the kernel's VMEM footprint must be
    # in the key, or a run under one knob records its (block, vmem) under
    # the key the default config loads — the same poisoning class the
    # n_chains term above guards against (round-3 advisor finding; e.g.
    # the thin engine adds its identity/transposed-gather tiles)
    return (
        f"{n}:{int(incremental)}:{cfg.mode.name}:{int(track_off)}"
        f":{cfg.n_moves_per_step}"
        f":{cfg.accept_draws}:{int(cfg.adapt)}:{n_chains}"
        f":{os.environ.get('MH_FUSED_UNROLL', '')}"
        f":{os.environ.get('MH_FUSED_RNG', 'counter')}"
        f":{os.environ.get('MH_FUSED_STREAMS', '')}"
        f":{os.environ.get('MH_FUSED_THIN', '1')}"
        f":{os.environ.get('MH_FUSED_SLABW', '8')}"
        # the preferred default block is part of the key: a proven fit
        # recorded under an older block policy must not override a new
        # default (the round-4 64 -> 128 change would otherwise be
        # silently undone by a stale sidecar entry)
        f":pref{block_chains(n)}"
    )


def _load_fits() -> None:
    global _FIT_LOADED
    if _FIT_LOADED:
        return
    _FIT_LOADED = True
    try:
        import json

        with open(_FIT_PATH) as f:
            _FIT_CACHE.update(json.load(f))
    except Exception:  # noqa: BLE001 — sidecar is best-effort
        pass


def _record_fit(n: int, cfg: SamplerConfig, incremental: bool,
                n_chains: int, bc: int, vmem: int,
                track_off: bool = True) -> None:
    key = _fit_key(n, cfg, incremental, n_chains, track_off)
    if _FIT_CACHE.get(key) == [bc, vmem]:
        return
    _FIT_CACHE[key] = [bc, vmem]
    try:
        import json

        with open(_FIT_PATH, "w") as f:
            json.dump(_FIT_CACHE, f)
    except Exception:  # noqa: BLE001
        pass


def _get_runner(
    scene: Scene,
    cfg: SamplerConfig,
    n_chains: int,
    interpret: bool,
    incremental: bool | None,
    bc_override: int | None,
    vmem_override: int | None = None,
):
    """Fetch/compile the per-shape jitted fused runner (see _RUNNER_CACHE)."""
    incremental = _resolve_incremental(incremental)
    packed = pack_scene(scene, cfg)
    # FIXED off-limits state machinery is compiled in only when the scene
    # weights the term (exact skip otherwise — see _fused_kernel). Static
    # per scene: a different weight re-keys the runner cache; the VMEM
    # model's extra FIXED tiles exist iff the state is tracked.
    track_off = _scene_track_off(scene, cfg)
    is_fixed = track_off
    n = packed.n
    n0 = scene.n_pad_objs
    # slab width for the incremental states (A/B; see _fused_kernel).
    # 16 measured 27% SLOWER than 8 at the headline shape (the [B,2W,N]
    # row eval's doubled volume beats the halved state passes) and 32
    # additionally fails Mosaic compile — 8 is the only production value.
    slab_w = int(os.environ.get("MH_FUSED_SLABW", "8"))
    if slab_w not in (8, 16) or n % slab_w:
        raise ValueError(f"MH_FUSED_SLABW={slab_w} invalid for n={n}")
    vmem = vmem_override or int(os.environ.get("MH_FUSED_VMEM", DEFAULT_VMEM))
    if bc_override:
        bc = bc_override
    elif interpret:
        bc = min(block_chains(n), n_chains)
    else:
        _load_fits()
        proven = _FIT_CACHE.get(
            _fit_key(n, cfg, incremental, n_chains, track_off)
        )
        if proven and vmem_override is None and "MH_FUSED_VMEM" not in os.environ:
            bc, vmem = int(proven[0]), int(proven[1])
        else:
            bc = min(block_chains(n), n_chains)
            if vmem_override is None and "MH_FUSED_VMEM" not in os.environ:
                # raise the scoped-VMEM request so the preferred block
                # fits the sizing model (bounded; round-4 B=128 default)
                need = int(
                    fused_vmem_estimate(bc, n, incremental, is_fixed, slab_w)
                    / 0.85
                )
                if vmem < need <= PREF_VMEM_CAP:
                    vmem = need
            bc, vmem = _fit_block_and_vmem(
                bc, n, vmem, incremental, is_fixed, slab_w
            )
    while bc > _BC_FLOOR and n_chains % bc:
        bc //= 2
    bc = min(bc, n_chains)
    if n_chains % bc:
        raise ValueError(f"n_chains must be a multiple of {bc}")

    if not (1 <= cfg.accept_draws <= 120):
        raise ValueError(
            f"fused kernel supports accept_draws in [1, 120], got "
            f"{cfg.accept_draws}"
        )
    # <= CLR_UNROLL_MAX real clearances run as unrolled [B, N] plane math
    # (params in SMEM); larger counts use the [B, C, N] tile path. (The
    # MH_FUSED_CLR=tile A/B override that forced the tile path at small
    # counts measured 1.4x slower and was deleted round 5.)
    clr_unroll = packed.n_clr_real <= CLR_UNROLL_MAX
    rng_hw = os.environ.get("MH_FUSED_RNG", "counter") == "hw"
    # thin engine (transposed per-chain scalar chains; see _fused_kernel's
    # t_cols/t_row helpers). Forces the counter RNG stream: the hardware
    # per-block stream draws [B, LANE] tiles that cannot be re-oriented.
    thin = os.environ.get("MH_FUSED_THIN", "1") == "1"
    if thin:
        rng_hw = False
    cache_key = (
        n, n0, n_chains, bc, cfg.mode, incremental,
        rng_hw, thin, slab_w, track_off,
        cfg.n_moves_per_step, cfg.adapt, cfg.accept_draws, interpret,
        clr_unroll, packed.n_clr_real, packed.clr_anchors,
        packed.rel_src_oh.shape, packed.rel_params.shape,
        packed.ang_src_oh.shape, packed.ang_params.shape,
        packed.clr_src_oh.shape, packed.clr_params.shape,
        vmem,
        os.environ.get("MH_FUSED_UNROLL", ""),
        os.environ.get("MH_FUSED_STREAMS", ""),
    )
    runner = _RUNNER_CACHE.get(cache_key)
    if runner is None:
        runner = _fused_runner(
            n=n, n0=n0, n_chains=n_chains, bc=bc,
            mode=cfg.mode, incremental=incremental,
            rng_hw=rng_hw,
            thin=thin, slab_w=slab_w, track_off=track_off,
            moves_per_step=cfg.n_moves_per_step, adapt=cfg.adapt,
            accept_draws=cfg.accept_draws,
            clr_unroll=clr_unroll, n_clr_real=packed.n_clr_real,
            clr_anchors=packed.clr_anchors, interpret=interpret,
            vmem_bytes=vmem,
            rel_shape=packed.rel_src_oh.shape,
            relp_shape=packed.rel_params.shape,
            ang_shape=packed.ang_src_oh.shape,
            angp_shape=packed.ang_params.shape,
            clr_shape=packed.clr_src_oh.shape,
            clrp_shape=packed.clr_params.shape,
        )
        _RUNNER_CACHE[cache_key] = runner
    return runner, packed, bc, vmem


def run_chains_fused_sharded(
    seed: Array,
    pose0: Array,
    scene: Scene,
    cfg: SamplerConfig,
    n_chains: int,
    iterations: int,
    mesh,
    interpret: bool = False,
    incremental: bool | None = None,
    bc_override: int | None = None,
):
    """The fused kernel sharded over ``mesh``'s chains axis (shard_map).

    Each device runs the VMEM-resident kernel on its ``n_chains/n_dev``
    local chains; the scene is replicated; zero collectives in the loop
    (chains are independent, like the reference's grid of blocks).

    Device-count invariance: the default counter-based stream is a pure
    function of (seed, GLOBAL chain id, draw counter, lane) — each device
    passes its first global chain index to the kernel — so every chain
    trajectory is bitwise identical on 1 chip or a pod slice, for ANY
    per-grid-step block size ``bc`` (fit-cache state and OOM retries
    cannot change results). Under ``MH_FUSED_RNG=hw`` (block-seeded
    hardware stream) invariance additionally requires equal ``bc`` across
    runs — pass ``bc_override`` there. Returns the same tuple as
    :func:`run_chains_fused` with global (mesh-sharded) arrays.
    """
    from jax.sharding import PartitionSpec as P

    from mh_tpu.parallel.mesh import CHAINS_AXIS

    n_dev = mesh.shape[CHAINS_AXIS]
    if n_chains % n_dev:
        raise ValueError(f"n_chains={n_chains} not divisible by mesh {n_dev}")
    n_local = n_chains // n_dev
    n0 = scene.n_pad_objs
    p0 = pose0 if pose0.ndim == 3 else jnp.broadcast_to(pose0, (n_chains, n0, 6))

    def invoke(runner, packed, bc):
        def device_fn(p0_local, *scene_args):
            dev = jax.lax.axis_index(CHAINS_AXIS)
            # element 2 = this device's first GLOBAL chain index; the
            # kernel derives per-chain streams (counter mode) or the
            # global block seed (hw mode) from it
            seed_arr = jnp.asarray([seed, iterations, 0], jnp.int32) + jnp.stack(
                [jnp.int32(0), jnp.int32(0), (dev * n_local).astype(jnp.int32)]
            )
            return runner(seed_arr, scene_args[0], scene_args[1], p0_local,
                          *scene_args[2:])

        sharded = jax.shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(P(CHAINS_AXIS),) + (P(),) * 11,
            out_specs=(
                P(CHAINS_AXIS), P(CHAINS_AXIS), P(CHAINS_AXIS), P(CHAINS_AXIS)
            ),
            check_vma=False,
        )
        args = _runner_args(packed, p0)
        # reorder: p0 (sharded) first, then the replicated scene operands
        return sharded(args[2], args[0], args[1], *args[3:])

    return _call_fused_protected(
        invoke, scene, cfg, n_local, interpret, incremental,
        bc_override,
    )


