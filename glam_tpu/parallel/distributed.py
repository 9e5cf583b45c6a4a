"""Multi-host utilities: initialization and host-group trial placement.

The single-host code paths (data_parallel / graph_partition) already
express everything through `jax.sharding.Mesh` + collectives, so scaling
to a multi-host TPU slice is a launch-topology concern, not a model
concern:

  * every host runs the SAME program; `initialize_distributed()` wires
    the jax.distributed runtime (coordinator discovery from env);
  * `global_mesh(axis_names)` builds a mesh over *all* devices of the
    slice — shard_map collectives then ride ICI within hosts and DCN
    across, scheduled by XLA;
  * the per-host data loader shards the graph stream by
    `process_index` (each host feeds only its devices' sub-batches);
  * for AutoML trial parallelism, `host_groups(n)` partitions the slice
    into n independent trial groups (reference GPUManager analog at pod
    scale — one low-fidelity trial per group).

This dev environment exposes one chip, so multi-host paths are covered
by the 8-virtual-device CPU mesh tests plus the driver's
`dryrun_multichip`; on a real slice, only `initialize_distributed()`
changes behavior.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks.

    On Cloud TPU slices the arguments are auto-discovered; elsewhere set
    GLAM_COORDINATOR / GLAM_NUM_PROCESSES / GLAM_PROCESS_ID."""
    import jax
    kwargs = {}
    addr = coordinator_address or os.environ.get("GLAM_COORDINATOR")
    if addr:
        kwargs["coordinator_address"] = addr
        kwargs["num_processes"] = int(
            num_processes if num_processes is not None
            else os.environ["GLAM_NUM_PROCESSES"])
        # NB: `or` would treat the coordinator's process_id=0 as missing
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["GLAM_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def global_mesh(axis_names=("data",), shape=None):
    """Mesh over every device in the slice (all hosts)."""
    import jax
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices())
    if shape is not None:
        devs = devs.reshape(shape)
    return Mesh(devs, axis_names)


def process_shard(items: Sequence, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> List:
    """Partition a dataset across hosts (each host loads its share)."""
    import jax
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pc == pi]


def host_groups(n_groups: int) -> List[List]:
    """Partition the slice's devices into n contiguous trial groups
    (AutoML trial parallelism at pod scale)."""
    import jax
    devs = jax.devices()
    if n_groups <= 0 or n_groups > len(devs):
        raise ValueError(f"bad n_groups {n_groups} for {len(devs)} devices")
    per = len(devs) // n_groups
    return [list(devs[i * per:(i + 1) * per]) for i in range(n_groups)]
