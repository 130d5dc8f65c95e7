"""Determinism tooling: fixed-order cross-shard reductions + donation audit.

Closes the two gaps in the SURVEY.md §5 "race detection / determinism" row
(reference: single-threaded C++, deterministic by construction — our risks
are all new):

1. **Multi-host psum ordering.** `jax.lax.psum` lowers to an XLA all-reduce
   whose association order is an implementation detail; floating-point sums
   are therefore only guaranteed reproducible for a *fixed* compilation +
   topology, and NOT guaranteed bitwise-equal to a single-device reduction
   or to a run on a differently-ordered device list. For the per-scan
   particle-weight collective (parallel/particles.py) that ambiguity is the
   one place a multi-host run could diverge run-to-run. `ladder_psum` fixes
   the association order structurally: an all-gather followed by a
   sequential index-order fold, so every shard computes
   ``((x_0 + x_1) + x_2) + ...`` — bitwise identical to the same fold on one
   device, on any mesh, under any XLA all-reduce strategy. The payload is
   P-sized (log-weights), so the all-gather costs nothing next to the map
   traffic; determinism is the point, not bandwidth.

2. **Buffer donation aliasing.** Donated inputs (`donate_argnums` on
   `run_sequence`, `make_sharded_step`, `ep_cow.make_ep_step`) are freed for
   reuse by XLA; a donated-then-reused host reference is the JAX analogue of
   a use-after-free race. `audit_donation` executes a function twice — once
   with donation on deep copies, once without — and asserts bitwise-equal
   outputs, proving the donation introduced no aliasing hazard.
   `DONATING_ENTRY_POINTS` records every donating jit in the package so the
   audit (tests/test_determinism.py) stays exhaustive.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array

#: every donate_argnums site in the package (audited in
#: tests/test_determinism.py::test_donating_entry_points_registry)
DONATING_ENTRY_POINTS: tuple[str, ...] = (
    "slam_constructor_tpu.models.engine.run_sequence",
    "slam_constructor_tpu.models.gmapping.run_sequence",
    "slam_constructor_tpu.parallel.particles.make_sharded_step",
    "slam_constructor_tpu.parallel.ep_cow.make_ep_step",
)


def ladder_psum(x: Array, axis_name: str) -> Array:
    """Fixed-association-order psum: all_gather then fold in index order.

    Bitwise-equal to ``functools.reduce(operator.add, shards)`` in shard
    index order on every participating device, independent of the XLA
    all-reduce algorithm, mesh shape, or device enumeration. Intended for
    small payloads on the determinism-critical path (particle log-weights,
    Neff, pose-graph residual norms) — NOT for map-sized tensors.
    """
    parts = jax.lax.all_gather(x, axis_name, axis=0)  # [n_shards, ...]
    n = parts.shape[0]

    def body(i, acc):
        return acc + parts[i]

    return jax.lax.fori_loop(1, n, body, parts[0])


def ladder_pmax(x: Array, axis_name: str) -> Array:
    """Fixed-order pmax companion (max is associative+commutative even in
    fp, but keeping both collectives on one code path keeps the audit
    simple)."""
    parts = jax.lax.all_gather(x, axis_name, axis=0)
    n = parts.shape[0]

    def body(i, acc):
        return jnp.maximum(acc, parts[i])

    return jax.lax.fori_loop(1, n, body, parts[0])


def deterministic_normalize_log_weights(
    logw: Array, mesh: Mesh, axis: str = "particles"
) -> Array:
    """Cross-shard log-weight normalization with a structurally fixed
    reduction order — the reproducible variant of
    ``parallel.particles.psum_normalize_log_weights``.

    Bitwise-reproducible across runs and across device re-orderings of the
    same mesh (tests/test_determinism.py proves both on the 8-device CPU
    mesh). Per-shard partials are computed identically to the psum variant
    (stable logsumexp around the global max).
    """

    def kernel(lw):
        gmax = ladder_pmax(jnp.max(lw), axis)
        gsum = ladder_psum(jnp.sum(jnp.exp(lw - gmax)), axis)
        return lw - (gmax + jnp.log(gsum))

    return shard_map(kernel, mesh=mesh, in_specs=P(axis), out_specs=P(axis))(
        logw
    )


def audit_donation(
    fn: Callable,
    donate_argnums: Sequence[int],
    *args,
    static_argnums: Sequence[int] = (),
    rtol: float = 0.0,
):
    """Run ``fn`` donated and undonated; assert outputs are bitwise equal.

    The donated call receives deep host copies of the donated arguments, so
    the undonated call's inputs are untouched — any divergence means the
    donation aliased a buffer that was still live inside the computation
    (the in-jit analogue of a data race). Returns the undonated outputs.
    ``rtol=0.0`` (default) demands bitwise equality.
    """

    def copy_tree(t):
        return jax.tree.map(lambda a: jnp.array(np.asarray(a)), t)

    donated_args = tuple(
        copy_tree(a) if i in set(donate_argnums) else a
        for i, a in enumerate(args)
    )
    f_don = jax.jit(
        fn, donate_argnums=tuple(donate_argnums), static_argnums=tuple(static_argnums)
    )
    f_plain = jax.jit(fn, static_argnums=tuple(static_argnums))
    out_d = jax.tree.map(np.asarray, f_don(*donated_args))
    out_p = jax.tree.map(np.asarray, f_plain(*args))

    def check(a, b):
        if rtol == 0.0:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=rtol)

    jax.tree.map(check, out_d, out_p)
    return out_p
