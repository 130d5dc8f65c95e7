"""Particle-filter primitives: weights, effective sample size, resampling.

Parity with the reference's generic PF layer (SURVEY.md §2.5 [unverified]:
``Particle`` / ``ParticleFilter<T>`` in ``src/core/particle_filter.h`` —
weight normalization, Neff test, resampling).

Re-design: weights live in log space and are normalized with logsumexp
(stable across many particles); systematic resampling is the sorted-uniform
+ ``searchsorted`` formulation, which is O(P log P), fully vectorized, and
deterministic given the PRNG key — the properties the multi-host psum-based
normalization (parallel/particles.py) builds on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def normalize_log_weights(logw: Array) -> Array:
    """Shift-normalize so that exp(logw) sums to 1."""
    return logw - jax.scipy.special.logsumexp(logw)


def effective_sample_size(logw: Array) -> Array:
    """Neff = 1 / sum(w^2) for normalized weights."""
    logw = normalize_log_weights(logw)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * logw))


def systematic_resample(key: Array, logw: Array, n: int | None = None) -> Array:
    """Systematic (low-variance) resampling.

    Returns int32 ancestor indices ``[n]`` such that particle i is replaced
    by particle ``idx[i]``. Uses one uniform offset + stratified comb.
    """
    p = logw.shape[0]
    n = n or p
    w = jnp.exp(normalize_log_weights(logw))
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), minval=0.0, maxval=1.0 / n)
    comb = u0 + jnp.arange(n, dtype=jnp.float32) / n
    idx = jnp.searchsorted(cdf, comb, side="right")
    return jnp.clip(idx, 0, p - 1).astype(jnp.int32)


def maybe_resample(
    key: Array, logw: Array, threshold_frac: float
) -> tuple[Array, Array, Array]:
    """Branch-free conditional resampling (fixed shapes under jit).

    Returns (ancestor indices, new log-weights, did_resample). When Neff >=
    threshold_frac * P the indices are the identity and weights unchanged.
    """
    p = logw.shape[0]
    neff = effective_sample_size(logw)
    do = neff < threshold_frac * p
    idx = systematic_resample(key, logw, p)
    identity = jnp.arange(p, dtype=jnp.int32)
    idx = jnp.where(do, idx, identity)
    new_logw = jnp.where(
        do, jnp.full((p,), -jnp.log(float(p))), normalize_log_weights(logw)
    )
    return idx, new_logw, do
