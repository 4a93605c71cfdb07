"""Multi-host (DCN) scale-out helpers.

The reference scales across nodes with mpirun + per-rank VegaInterface
replicas (bin/run_vega_mpi.py). Here multi-host runs use
jax.distributed: every host executes the same single-controller script,
jax.distributed.initialize() wires the hosts together, and the global
mesh spans all devices. Parameter batches shard over the global device
axis — batch items land host-locally, so the likelihood work rides ICI
within each host and only result gathering crosses DCN (the likelihood
itself needs no collectives; constants are replicated).

Usage on each host (same script everywhere):

    from vega_tpu.parallel.distributed import initialize, global_mesh
    initialize()                      # env-driven (coordinator, ids)
    mesh = global_mesh()              # 1D mesh over all global devices
    bl = BatchedLikelihood(vega, mesh=mesh)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """jax.distributed.initialize with env-variable fallbacks
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID or the
    cluster auto-detection built into jax)."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as exc:  # single-host runs are fine without it
        print(f'INFO: jax.distributed not initialized ({exc}); '
              'running single-host.')


def global_mesh(axis_name='batch'):
    """1D mesh over all global devices, ordered host-major so a sharded
    batch keeps each host's items on its own chips (likelihood batches
    never cross DCN)."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def local_batch_slice(total_batch):
    """The [start, stop) slice of a global batch this process owns."""
    per_proc = total_batch // jax.process_count()
    start = jax.process_index() * per_proc
    stop = (start + per_proc if jax.process_index() < jax.process_count() - 1
            else total_batch)
    return start, stop
