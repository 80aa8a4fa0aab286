"""Multi-host (pod / DCN) execution skeleton.

SURVEY §5's distributed-backend row and BASELINE's ≥85% two-host scaling
target assume multi-host execution.  The reference's only analog is MPI
around MultiNest (``NestedSampling_0.py:329-334`` — rank-parallel
likelihood evaluations over DCN); the TPU-native design instead follows
the standard JAX pod recipe:

1. every host process calls :func:`initialize` (``jax.distributed``)
   before any other JAX call — the coordinator handshakes the global
   device view;
2. a single GLOBAL mesh is laid out with the ``data`` axis across hosts
   and the ``wave`` axis within a host, so the bandwidth-hungry wave-halo
   traffic of the LBL/k-table shards rides ICI while only the
   embarrassingly-parallel data axis (retrieval batches, geometries,
   nested-sampling live points) crosses DCN;
3. every process executes the SAME jitted program on its
   addressable shard (SPMD); host-local input feeding uses
   ``jax.make_array_from_process_local_data``.

No multi-host hardware exists in this environment, so the mesh layout and
the host-axis code path are exercised single-process: ``hosts_axis_mesh``
accepts an explicit ``n_hosts`` that partitions the (virtual) device list
into contiguous "host" groups exactly as the process-indexed global
device list would be on a real pod, and ``__graft_entry__.
dryrun_multichip(n, n_hosts=...)`` asserts sharded == unsharded through
it.  On a real pod the same function derives the grouping from
``process_index`` instead.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Bring up ``jax.distributed`` for a multi-host run; returns the
    process index (0 on single-host runs).

    Must be called before any other JAX API touches the backend.  All
    parameters default from the standard launcher environment
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``; on Cloud TPU pods ``jax.distributed.initialize()``
    auto-discovers all three from the TPU metadata, so plain
    ``initialize()`` works there too).  A no-op when neither arguments
    nor environment request multiple processes — single-host runs,
    including this repo's tests, never pay the coordinator handshake.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        return 0  # single-process: nothing to initialize

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def hosts_axis_mesh(
    n_hosts: Optional[int] = None,
    devices=None,
    data_axis: str = "data",
    wave_axis: str = "wave",
) -> Mesh:
    """(hosts × local-devices) mesh: ``data`` across hosts (DCN), ``wave``
    within a host (ICI).

    On a real pod (``jax.process_count() > 1``) the grouping comes from
    each device's ``process_index`` — JAX guarantees ``jax.devices()`` is
    ordered by process, so a reshape to (n_processes, local) puts DCN
    exactly along the leading axis.  Single-process, ``n_hosts`` slices
    the device list into contiguous groups to *simulate* that layout (the
    partitioner and collective placement are identical; only the physical
    transport differs).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_hosts is None:
        n_hosts = jax.process_count()
    if n % n_hosts != 0:
        raise ValueError(
            f"{n} devices do not split over {n_hosts} hosts"
        )
    local = n // n_hosts
    if jax.process_count() > 1:
        # order by owning process so axis 0 is the DCN axis
        devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    dev = np.asarray(devices).reshape(n_hosts, local)
    return Mesh(dev, axis_names=(data_axis, wave_axis))


def process_local_batch(mesh: Mesh, global_batch, data_axis: str = "data"):
    """Build a global data-axis-sharded array from per-process data.

    Single-process this is just a device_put with the data axis sharded;
    multi-process each host passes ITS slice of the global batch and JAX
    assembles the global logical array (the standard
    ``make_array_from_process_local_data`` pod-feeding recipe).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(data_axis))
    if jax.process_count() == 1:
        return jax.device_put(global_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, global_batch)
