"""Multi-host initialization and process-level helpers.

Replaces the reference's NCCL/env:// bootstrap (``utils/distributed.py``):

  * ``init_process_group(nccl)`` + RANK/SLURM resolution (:37-90)
      -> :func:`initialize` wrapping ``jax.distributed.initialize`` (DCN
      rendezvous; ICI needs no setup)
  * DDP wrap / DataParallel fallback (:97-104)   -> pjit over the mesh
  * ``build_sampler`` rank sharding (:156-180)   -> data.loader.shard_indices
  * flat-buffer all-reduce helpers (:183-213)    -> in-graph psum/pmean via
      GSPMD (host-side helpers below exist for rare eager needs)

The dead horovod helpers (:216-381) have no equivalent — they were
unreachable in the reference too (SURVEY §2.3).
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _multihost_markers(env) -> list:
    """Environment evidence of an ACTUALLY multi-host job.  Mere presence
    of TPU worker vars is not enough: single-host boxes (and this repo's
    own dev runtime) carry ``TPU_WORKER_HOSTNAMES=localhost`` /
    ``TPU_WORKER_ID=0`` for one host — only >1 hostnames, WORLD_SIZE>1, or
    a megascale coordinator mean peers exist to rendezvous with."""
    out = []
    hosts = env.get("TPU_WORKER_HOSTNAMES", "")
    if hosts and len([h for h in hosts.split(",") if h.strip()]) > 1:
        out.append(f"TPU_WORKER_HOSTNAMES={hosts}")
    try:
        if int(env.get("WORLD_SIZE", "1")) > 1:
            out.append(f"WORLD_SIZE={env['WORLD_SIZE']}")
    except ValueError:
        pass
    if "MEGASCALE_COORDINATOR_ADDRESS" in env:
        out.append("MEGASCALE_COORDINATOR_ADDRESS")
    return out


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Multi-host (multi-slice / DCN) rendezvous.

    On Cloud TPU the arguments are auto-detected from the metadata server;
    explicit values mirror the reference's RANK / SLURM_PROCID / NODE_RANK
    resolution chain (utils/distributed.py:37-60).

    Must run before any other jax call touches the backend (probing
    jax.process_count() here would itself initialize a single-process
    backend and break the rendezvous).
    """
    try:
        from jax._src.distributed import global_state
        if global_state.client is not None:
            return  # already initialized
    except Exception:
        pass
    env = os.environ
    try:
        from jax._src import xla_bridge
        backends_up = xla_bridge.backends_are_initialized()
    except Exception:
        backends_up = False
    if backends_up:
        # rendezvous is impossible once the backend exists; on a real pod
        # this is a caller-ordering bug, in a test harness it is routine
        markers = _multihost_markers(env)
        if markers:
            raise RuntimeError(
                "the XLA backend was initialized before initialize() on "
                f"what looks like a multi-host environment ({markers}); "
                "call initialize() before any jax API that touches devices")
        logger.debug("backend already initialized; skipping rendezvous")
        return
    if coordinator_address is None:
        coordinator_address = env.get("COORDINATOR_ADDRESS")
    if num_processes is None and "WORLD_SIZE" in env:
        num_processes = int(env["WORLD_SIZE"])
    if process_id is None:
        for key in ("RANK", "SLURM_PROCID", "NODE_RANK"):
            if key in env:
                process_id = int(env[key])
                break
    if coordinator_address is None and num_processes is None:
        # single host or auto-detected TPU environment
        try:
            jax.distributed.initialize()
        except Exception as e:
            # Only a plain single-process run may degrade silently.  On a
            # pod slice a failed rendezvous must NOT fall through: every
            # host would see only local devices, all report
            # process_index 0, train the full dataset independently and
            # race on the same checkpoint path.
            pod_markers = _multihost_markers(env)
            if pod_markers:
                raise RuntimeError(
                    "jax.distributed.initialize() failed on what looks "
                    f"like a multi-host pod (env: {pod_markers}); refusing "
                    "to continue as N independent single-process trainings"
                ) from e
            logger.debug("jax.distributed.initialize skipped "
                         "(single-process run): %s", e)
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_main_process() -> bool:
    return jax.process_index() == 0


def world_size() -> int:
    return jax.process_count()


def all_reduce_mean_host(value: float) -> float:
    """Eager cross-host mean for host-side scalars (rarely needed; training
    metrics are already global in-graph)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils
    arr = multihost_utils.process_allgather(np.asarray([value]))
    return float(np.mean(arr))


def broadcast_host(value, root: int = 0):
    """Broadcast a host value from the root process (replaces the
    reference's any_broadcast, utils/distributed.py:349-381)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(value,
                                                is_source=jax.process_index()
                                                == root)
