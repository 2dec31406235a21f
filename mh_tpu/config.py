"""Configuration, constants, and the parity/fixed mode switch.

The reference hard-codes its constants at ``Kernel.cu:31-39``:

- ``PI`` is defined as **3.1416** (not math.pi) — ``Kernel.cu:31``. Every
  angular normalization in the reference (theta wrap, phi offset, rotation
  wrap) uses this truncated value, so parity mode must use it too.
- ``BETA = 2.0`` — the inverse temperature of the Boltzmann accept rule
  (``Kernel.cu:33,712``).
- ``S_SIGMA_T = 15/90*PI`` — the rotation-proposal std (``Kernel.cu:39``).
- ``THETA_R`` and ``S_SIGMA_P`` are defined but never used by the reference;
  the translation std is ``surface_extent / 16`` (``Kernel.cu:590-591``).

``CostMode`` selects between bit-for-bit behavioral parity with the
reference's quirks and a "fixed" mode with the obvious corrections:

parity quirks reproduced (see SURVEY.md §2.3):
  * total cost multiplies PairWise by PairWiseAngle (``Kernel.cu:518``);
  * OffLimits is weighted and reported but excluded from the total
    (``Kernel.cu:547``);
  * ``minValue``'s first x-candidate is missing the translation
    (``Kernel.cu:371``);
  * SurfaceArea translates clearance rect *i* by object *i*'s position
    (loop index) instead of its SourceIndex (``Kernel.cu:456``);
  * PairWiseAngle's in-range test uses ``||`` so the penalty applies even
    inside the target range (``Kernel.cu:251``);
  * all angle math uses PI = 3.1416.

fixed mode: sums PairWise + PairWiseAngle, includes OffLimits in the total,
translates every vertex, indexes clearances by SourceIndex, penalizes angles
only outside the target range, and uses true pi.
"""

from __future__ import annotations

import dataclasses
import enum
import math

# --- reference constants (Kernel.cu:31-39) ---------------------------------
REF_PI: float = 3.1416  # Kernel.cu:31 — intentionally truncated
REF_BETA: float = 2.0  # Kernel.cu:33
REF_SIGMA_T: float = 15.0 / 90.0 * REF_PI  # Kernel.cu:39 (S_SIGMA_T)
TRUE_PI: float = math.pi

# Large-but-finite sentinel replacing the reference's DBL_MAX extents
# (Kernel.cu:345-363). Finite so float32 min/max arithmetic never produces
# inf - inf = nan; it is only ever compared, never multiplied (degenerate
# intersections are zeroed before the area product).
BIG: float = 1e30


class CostMode(enum.Enum):
    """Objective semantics: exact reference parity vs corrected math."""

    PARITY = "parity"
    FIXED = "fixed"

    @property
    def pi(self) -> float:
        return REF_PI if self is CostMode.PARITY else TRUE_PI


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler configuration (replaces ``gpuConfig``, Kernel.cu:119-127).

    The reference's grid/block dims map to ``n_chains`` (gridxDim = number of
    suggestions) and ``n_moves_per_step`` (blockxDim threads each injecting a
    proposal per iteration — here a deterministic compound block proposal).
    """

    iterations: int = 100
    n_chains: int = 1
    n_moves_per_step: int = 1
    # Accept-rule emulation of the reference's blockxDim>1 default: each of
    # the reference's 64 threads draws an INDEPENDENT accept decision on the
    # shared compound candidate (``Kernel.cu:819``), so the effective
    # acceptance of the compound proposal is 1-(1-p)^K. ``accept_draws=K``
    # reproduces that marginal exactly and deterministically: accept iff
    # min of K uniforms < ratio. 1 == one draw per proposal (the clean
    # semantics). For reference-default behavior set both
    # ``n_moves_per_step`` and ``accept_draws`` to blockxDim.
    accept_draws: int = 1
    beta: float = REF_BETA
    sigma_t: float = REF_SIGMA_T
    # Translation std = extent/16 (Kernel.cu:590-591); override if >0.
    sigma_xy_override: float = 0.0
    # DECISION (deliberate deviation from SURVEY §7.3, which suggested
    # FIXED as the user-facing default): the default stays PARITY so that
    # out-of-the-box behavior is bit-for-bit the reference's semantics —
    # the correctness gate, every oracle test, and the posterior-parity
    # suite anchor on it, and a user migrating from the reference gets
    # identical sampling behavior without reading docs. FIXED (sane
    # aggregation: PairWise+Angle sum, OffLimits in the total, corrected
    # AABB/anchor indexing) is one flag away and is what docs/API.md
    # recommends for NEW scenes; see docs/API.md "Cost modes".
    mode: CostMode = CostMode.PARITY
    # Step-size adaptation (off by default == reference behavior).
    adapt: bool = False
    target_accept: float = 0.44
    adapt_rate: float = 0.05

    def __post_init__(self) -> None:
        if self.iterations < 0 or self.n_chains < 1 or self.n_moves_per_step < 1:
            raise ValueError(f"invalid sampler config: {self}")
        if self.accept_draws < 1:
            raise ValueError(f"accept_draws must be >= 1: {self}")
