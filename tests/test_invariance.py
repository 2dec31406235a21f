"""MH detailed-balance / stationarity invariants (SURVEY.md §4b).

The reference has no correctness tests at all; these pin the statistical
contract of the sampler family:

1. the Boltzmann accept rule realizes a(Δ) = min(1, exp(βΔ))
   (``Kernel.cu:706-713``) — with a symmetric proposal this *is* detailed
   balance, a(Δ)/a(−Δ) = exp(βΔ);
2. the generic RW-Metropolis kernel leaves its exact target invariant
   (iid-from-target population is unchanged in distribution by K steps);
3. the full layout MH kernel (translate/rotate/swap with clamp/wrap,
   block proposals) has a stationary law: after burn-in, further steps do
   not drift the population's cost distribution.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mh_tpu.config import SamplerConfig
from mh_tpu.models.scene import demo_scene
from mh_tpu.sampler.generic import rw_metropolis
from mh_tpu.sampler.mh import boltzmann_accept, run_chains


def test_boltzmann_accept_probability_and_detailed_balance():
    """Empirical accept frequency matches min(1, exp(beta*delta)) per delta,
    and the frequency ratio a(+d)/a(-d) matches exp(beta*d) — the detailed
    balance identity for a symmetric proposal."""
    beta = 2.0
    n = 200_000
    keys = jax.random.split(jax.random.key(7), n)
    deltas = [-1.2, -0.35, -0.05, 0.0, 0.4, 2.0]
    freq = {}
    for d in deltas:
        acc = jax.vmap(
            lambda k: boltzmann_accept(k, jnp.float32(d), jnp.float32(0.0), beta)
        )(keys)
        freq[d] = float(jnp.mean(acc.astype(jnp.float32)))

    for d in deltas:
        p = min(1.0, float(np.exp(beta * d)))
        # 5-sigma binomial band
        tol = 5.0 * np.sqrt(max(p * (1 - p), 1e-12) / n) + 1e-6
        assert abs(freq[d] - p) < tol, (d, freq[d], p)

    # a(+d)/a(-d) == exp(beta d) for the pairs present
    for d in (0.35, 1.2):
        ratio = freq[d if d in freq else -d]  # a(+d) is 1.0 exactly for d>0
        a_pos = freq.get(d, 1.0)
        a_neg = freq[-d]
        assert abs(a_pos / a_neg - np.exp(beta * d)) / np.exp(beta * d) < 0.05


def test_rw_metropolis_preserves_standard_normal():
    """Chains initialized iid from N(0,1) stay N(0,1)-distributed after K
    RW-MH steps targeting N(0,1): exact-invariance check of the generic
    kernel (symmetric proposal + Boltzmann accept => pi-reversible)."""
    m = 8192
    k_init, k_run = jax.random.split(jax.random.key(11))
    theta0 = jax.random.normal(k_init, (m, 1))

    def logdensity(t):
        return -0.5 * jnp.sum(t * t)

    samples, final = rw_metropolis(
        k_run, logdensity, theta0, n_samples=10, n_chains=m, step_size=1.1
    )
    x = np.asarray(final.theta[:, 0], np.float64)

    # moment bands: SE(mean)=1/sqrt(m), SE(var)~sqrt(2/m), SE(m4)~sqrt(96/m)
    assert abs(x.mean()) < 5.0 / np.sqrt(m)
    assert abs(x.var() - 1.0) < 5.0 * np.sqrt(2.0 / m)
    assert abs((x**4).mean() - 3.0) < 5.0 * np.sqrt(96.0 / m)
    # tail mass at +/-1: P(|x|>1) = 0.3173
    p_tail = float(np.mean(np.abs(x) > 1.0))
    assert abs(p_tail - 0.3173) < 5.0 * np.sqrt(0.3173 * 0.6827 / m)


def test_layout_mh_population_is_stationary_after_burnin():
    """Two independent chain populations run for T and T+K steps: once past
    burn-in, K extra kernel applications must not shift the cost
    distribution (stationarity of the full translate/rotate/swap kernel).
    Catches sign errors, asymmetric-proposal bugs, and scale drift."""
    spec = demo_scene(8)
    scene = spec.build()
    m = 256
    t_burn, k_extra = 400, 128

    cfg_a = SamplerConfig(iterations=t_burn, n_chains=m, n_moves_per_step=1)
    cfg_b = SamplerConfig(iterations=t_burn + k_extra, n_chains=m)
    sa, _ = run_chains(jax.random.key(21), spec.initial_pose(), scene, cfg_a)
    sb, _ = run_chains(jax.random.key(22), spec.initial_pose(), scene, cfg_b)

    ca = np.asarray(sa.costs.total, np.float64)
    cb = np.asarray(sb.costs.total, np.float64)
    sem = np.sqrt(ca.var() / m + cb.var() / m)
    assert abs(ca.mean() - cb.mean()) < 5.0 * sem + 1e-3, (
        ca.mean(), cb.mean(), sem
    )
    # spread must match too (drift can preserve the mean)
    assert 0.7 < (ca.std() + 1e-9) / (cb.std() + 1e-9) < 1.4
