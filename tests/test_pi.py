"""MC-pi estimator vs analytic pi within Monte-Carlo error (BASELINE config 1)."""

import math

import jax
import numpy as np
import pytest

from mh_tpu.models.pi import estimate_pi


@pytest.mark.parametrize("seed", [0, 1])
def test_pi_within_mc_error(seed):
    n = 1 << 18
    est = float(estimate_pi(jax.random.key(seed), n_samples=n))
    # sigma of the estimator = 4*sqrt(p(1-p)/n), p = pi/4 -> ~0.0032 at n=2^18
    sigma = 4 * math.sqrt((math.pi / 4) * (1 - math.pi / 4) / n)
    assert abs(est - math.pi) < 6 * sigma


def test_pi_deterministic():
    a = float(estimate_pi(jax.random.key(3), n_samples=1 << 16))
    b = float(estimate_pi(jax.random.key(3), n_samples=1 << 16))
    assert a == b
