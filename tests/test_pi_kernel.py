"""Pallas pi kernel vs analytic pi (TPU hardware only)."""

import math

import jax
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="pi kernel needs TPU PRNG primitives",
)


def test_pi_kernel_within_mc_error():
    from mh_tpu.kernels.pi_kernel import estimate_pi_fused

    est, total = estimate_pi_fused(0, 1 << 24)
    sigma = 4 * math.sqrt((math.pi / 4) * (1 - math.pi / 4) / total)
    assert abs(float(est) - math.pi) < 6 * sigma


def test_pi_kernel_deterministic():
    from mh_tpu.kernels.pi_kernel import estimate_pi_fused

    a, _ = estimate_pi_fused(3, 1 << 22)
    b, _ = estimate_pi_fused(3, 1 << 22)
    assert float(a) == float(b)
