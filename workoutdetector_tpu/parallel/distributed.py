"""Multi-host (TPU pod / multi-slice) initialization.

TPU-native replacement of the reference's torch.distributed.launch +
init_dist('pytorch', backend='gloo') stack (SURVEY §2.8;
reference tools/dist_train.sh:1-11, train.py:29-42): one call to
jax.distributed.initialize per host, then the SAME single-program trainer
runs SPMD — the mesh spans all hosts' devices and jax handles the
DCN rendezvous. Per-host data feeding goes through
parallel.mesh.shard_batch (jax.make_array_from_process_local_data).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host jax. No-ops on single host.

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; on other clusters pass them (or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, the launcher contract of
    tools/dist_train.sh).
    """
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return  # single-host: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address or
        os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id if process_id is not None else
        int(os.environ.get("JAX_PROCESS_ID", "0")))


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0
