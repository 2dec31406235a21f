"""Scene validation + runtime invariant checking.

The reference ships real data races and an unbounded spin loop with no
sanitizers (SURVEY.md §5 race detection). JAX's functional purity removes
the race class by construction; what remains worth checking is *data*
validity (index bounds, mask consistency) and *numerical* health (finite
costs). Host-side :func:`validate_spec` runs before building; jitted
:func:`check_state_finite` uses ``checkify`` so chains can assert
finiteness without leaving the compiled program.
"""

from __future__ import annotations

import numpy as np
from jax.experimental import checkify

from mh_tpu.models.scene import SceneSpec


def validate_spec(spec: SceneSpec) -> list[str]:
    """Return a list of problems (empty == valid)."""
    errs: list[str] = []
    n = spec.n_objs
    pos = np.asarray(spec.positions)
    if pos.shape != (n, 6):
        errs.append(f"positions shape {pos.shape} != ({n}, 6)")
    if np.asarray(spec.sizes).shape != (n, 2):
        errs.append(f"sizes shape {np.asarray(spec.sizes).shape} != ({n}, 2)")
    if np.asarray(spec.frozen).shape != (n,):
        errs.append("frozen shape mismatch")
    if np.asarray(spec.offlimit_quads).reshape(-1, 4, 2).shape[0] != n:
        errs.append("offlimit_quads count != n_objs")
    if np.asarray(spec.surface_quad).reshape(-1, 2).shape[0] != 4:
        errs.append("surface_quad must have 4 vertices")
    if not np.isfinite(pos).all():
        errs.append("non-finite positions")

    for kind, rels in (
        ("relationship", spec.relationships),
        ("angle_relationship", spec.angle_relationships),
    ):
        for i, r in enumerate(rels):
            s, t = int(r[0]), int(r[1])
            if not (0 <= s < n and 0 <= t < n):
                errs.append(f"{kind}[{i}] index out of range: ({s}, {t})")
    for i, (quad, src) in enumerate(spec.clearances):
        if not 0 <= int(src) < n:
            errs.append(f"clearance[{i}] source index {src} out of range")
        if np.asarray(quad).reshape(-1, 2).shape[0] != 4:
            errs.append(f"clearance[{i}] quad must have 4 vertices")
    if bool(np.all(np.asarray(spec.frozen))) and n > 0:
        errs.append(
            "all objects frozen: proposals are no-ops (the reference would "
            "spin forever here, Kernel.cu:600-602)"
        )
    return errs


def require_valid(spec: SceneSpec) -> None:
    errs = validate_spec(spec)
    if errs:
        raise ValueError("invalid scene: " + "; ".join(errs))


def check_state_finite(state) -> None:
    """checkify-able assertion that a sampler state is numerically healthy.

    Use inside jitted code via ``checkify.checkify``:

    >>> checked = checkify.checkify(lambda s: check_state_finite(s))
    >>> err, _ = checked(state); err.throw()
    """
    import jax.numpy as jnp

    checkify.check(jnp.isfinite(state.pose).all(), "non-finite pose in state")
    checkify.check(
        jnp.isfinite(state.costs.total).all(), "non-finite total cost"
    )
