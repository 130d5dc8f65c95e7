"""Multi-host runtime: process-group init, failure detection, recovery.

SURVEY.md §5: the reference has no failure story (single process). The
TPU-native plan: ``jax.distributed`` process groups over DCN; liveness
checked by running a deadline-guarded collective; recovery = restart the
process group and restore every engine state from the last checkpoint
(states are pure pytrees — see utils/checkpoint, which is why recovery is
"load + continue" with bit-identical semantics).

Single-host sessions (including the CI mesh of 8 virtual CPU devices) run
the same code with ``n_processes == 1`` — collectives over the in-process
mesh. Multi-process behavior requires real multi-host launch; the API is
kept total so the driver's dryrun exercises it unmodified.
"""

from __future__ import annotations

import concurrent.futures
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Join the process group (no-op for single-process runs).

    Reads JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    arguments are omitted — the launcher contract.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0"))
    )
    if num_processes > 1 and coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_id": getattr(jax, "process_index", lambda: 0)(),
        "num_processes": getattr(jax, "process_count", lambda: 1)(),
        "devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }


def heartbeat(mesh, axis: str = "hosts", timeout_s: float = 30.0) -> bool:
    """Liveness probe: a tiny psum across ``axis`` under a deadline.

    Returns False (suspected peer failure) if the collective does not
    complete in time — the signal the driver uses to trigger recovery.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    x = jnp.ones((n,), jnp.float32)

    def probe():
        def kernel(v):
            return jax.lax.psum(v, axis)

        out = shard_map(
            kernel, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
            check_vma=False,
        )(x)
        return float(np.asarray(out)[0])

    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(probe)
        try:
            return fut.result(timeout=timeout_s) == float(n)
        except concurrent.futures.TimeoutError:
            return False


class RecoveryLoop:
    """Checkpoint-based elastic recovery driver.

    Usage:
        loop = RecoveryLoop(ckpt_path, template_state, save_every=100)
        state = loop.restore_or(init_state)
        for scan in stream:
            state = step(state, scan)
            loop.tick(state)

    On a detected failure, the launcher restarts the job; the next run's
    ``restore_or`` resumes from the last snapshot deterministically.
    """

    def __init__(self, path: str, save_every: int = 100):
        self.path = path
        self.save_every = save_every
        self._count = 0

    def restore_or(self, template, init_fn):
        from ..utils import checkpoint

        for candidate in (self.path, self.path + ".npz"):
            if os.path.exists(candidate):
                return checkpoint.restore(candidate, template), True
        return init_fn(), False

    def tick(self, state) -> None:
        from ..utils import checkpoint

        self._count += 1
        if self._count % self.save_every == 0:
            tmp = self.path + ".tmp"
            checkpoint.save(tmp, state)
            os.replace(tmp + ".npz", self.path + ".npz")
