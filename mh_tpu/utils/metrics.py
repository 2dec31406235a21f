"""Sampler diagnostics: acceptance, ESS, split-R-hat.

The reference has no observability at all — its per-chain cost writeback is
commented out (``Kernel.cu:852-861``) and the only instrumentation is
printf (SURVEY.md §5). This module provides the standard MCMC health
metrics over traces produced by the samplers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def effective_sample_size(trace: Array, max_lag: int | None = None) -> Array:
    """ESS of a scalar chain trace f32[T] via initial-positive-sequence autocorr."""
    trace = jnp.asarray(trace, jnp.float32)
    t = trace.shape[0]
    max_lag = max_lag or min(t - 1, 256)
    x = trace - jnp.mean(trace)
    var = jnp.mean(jnp.square(x))

    def rho(lag):
        a = jax.lax.dynamic_slice_in_dim(x, 0, t - max_lag)
        b = jax.lax.dynamic_slice_in_dim(x, lag, t - max_lag)
        return jnp.mean(a * b) / jnp.maximum(var, 1e-30)

    rhos = jax.vmap(rho)(jnp.arange(1, max_lag + 1))
    # truncate at first non-positive autocorrelation (Geyer-style)
    pos = jnp.cumprod(rhos > 0).astype(jnp.float32)
    tau = 1.0 + 2.0 * jnp.sum(rhos * pos)
    return t / jnp.maximum(tau, 1.0)


def split_r_hat(traces: Array) -> Array:
    """Split-R-hat over chain traces f32[C, T] (Gelman-Rubin, split in half)."""
    traces = jnp.asarray(traces, jnp.float32)
    c, t = traces.shape
    half = t // 2
    splits = jnp.concatenate([traces[:, :half], traces[:, half : 2 * half]], axis=0)
    m, n = splits.shape
    chain_means = jnp.mean(splits, axis=1)
    chain_vars = jnp.var(splits, axis=1, ddof=1)
    b = n * jnp.var(chain_means, ddof=1)
    w = jnp.mean(chain_vars)
    var_plus = (n - 1) / n * w + b / n
    return jnp.sqrt(var_plus / jnp.maximum(w, 1e-30))


def summarize_chains(cost_traces: Array) -> dict:
    """Summary dict for f32[C, T] cost traces: mean/std/ESS/R-hat."""
    ess = jax.vmap(effective_sample_size)(cost_traces)
    return {
        "mean": jnp.mean(cost_traces, axis=1),
        "std": jnp.std(cost_traces, axis=1),
        "ess": ess,
        "r_hat": split_r_hat(cost_traces),
    }
