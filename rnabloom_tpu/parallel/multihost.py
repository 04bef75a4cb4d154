"""Multi-host (multi-process) execution scaffolding.

The sharded engine's mesh programs are host-count-agnostic: every filter
shard lives on one device, queries ride all-to-alls over ICI within a
slice and DCN across slices, and the same shard_map programs compile
unchanged under multi-controller JAX.  What multi-host adds is (1) process
group initialization and (2) feeding each process only its slice of the
input — the generalization of the reference's N threads sharing one
synchronized reader (RNABloom.java:1203-1238) to N hosts sharing the
input file set.

Usage (one command per host):

    python -m rnabloom_tpu.cli ... \
        -coordinator HOST0:9876 -nprocs 2 -procid $ID

Only single-process execution is exercised by this repo's test rig (one
TPU chip / a virtual CPU mesh); the helpers below use only stable JAX
multi-controller APIs (jax.distributed.initialize,
make_array_from_process_local_data).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import numpy as np


def initialize(coordinator: str, num_processes: int, process_id: int) -> None:
    """Join the JAX process group; after this, jax.devices() is global."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def partition_paths(paths: Sequence[str], process_id: int, num_processes: int) -> List[str]:
    """Static file partitioning: process i reads files i, i+n, i+2n, ...
    (the reference's per-file worker assignment, populateGraphHelper
    RNABloom.java:1178-1246, generalized across hosts)."""
    return [p for j, p in enumerate(paths) if j % num_processes == process_id]


def global_batch(mesh, local_codes: np.ndarray):
    """Assemble a mesh-global (B_global, L) batch from this process's rows.

    Each process contributes its local read rows; the result is a jax.Array
    sharded row-wise over the mesh, ready for the sharded build/query
    programs.  With one process this is a plain device_put.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
    if jax.process_count() == 1:
        return jax.device_put(local_codes, sharding)
    return jax.make_array_from_process_local_data(sharding, local_codes)
