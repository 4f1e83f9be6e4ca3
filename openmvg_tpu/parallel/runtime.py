"""Multi-host runtime bring-up.

The reference scales past one machine only by hand-chunking files
(SURVEY §2.8 — main_SplitMatchFileIntoMatchFiles.cpp); the TPU-native
replacement is a real multi-process runtime: `jax.distributed` connects
the processes, every process sees the global device set, and the existing
mesh-based code (parallel/dist_ba.py, pair-sharded matching) runs
unchanged over a global mesh — shard_map collectives ride ICI inside a
slice and DCN across slices.

Usage (one call per process, before any jax computation):

    from openmvg_tpu.parallel import runtime
    runtime.initialize()        # env-driven (TPU pods auto-detect)
    mesh = runtime.global_mesh()

On TPU pods `jax.distributed.initialize()` auto-discovers everything; on
CPU/GPU clusters pass coordinator/num_processes/process_id or set
OMT_COORDINATOR / OMT_NUM_PROCESSES / OMT_PROCESS_ID.

Tested by tests/test_multiprocess.py: two real OS processes on a CPU
Gloo backend run observation-sharded BA over a 4-device global mesh and
must match the single-device solve.
"""

import os

import numpy as np

import jax
from jax.sharding import Mesh


_initialized = False


def initialize(coordinator=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Bring up jax.distributed (idempotent).

    Argument resolution order: explicit args > OMT_* env vars > jax
    auto-detection (TPU pods).  Returns (process_index, local_devices,
    global_device_count).
    """
    global _initialized
    coordinator = coordinator or os.environ.get("OMT_COORDINATOR")
    if num_processes is None and "OMT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["OMT_NUM_PROCESSES"])
    if process_id is None and "OMT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["OMT_PROCESS_ID"])
    if not _initialized and (coordinator or num_processes is not None
                             or jax.default_backend() == "tpu"):
        kwargs = {}
        if coordinator:
            kwargs["coordinator_address"] = coordinator
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        if local_device_ids is not None:
            kwargs["local_device_ids"] = local_device_ids
        jax.distributed.initialize(**kwargs)
        _initialized = True
    return (jax.process_index(), jax.local_device_count(),
            jax.device_count())


def global_mesh(axis="hosts"):
    """1-D mesh over ALL global devices (every process must call this with
    the same arguments)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def hybrid_mesh(dcn_axis="pods", ici_axis="hosts"):
    """2-D (slices, per-slice-devices) mesh: the DCN axis spans slices,
    the ICI axis spans devices within a slice.  Falls back to
    (1, n_devices) when the topology is flat."""
    from jax.experimental import mesh_utils

    n_proc = jax.process_count()
    n_per = jax.local_device_count()
    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            (1, n_per), (n_proc, 1), devices=jax.devices())
    except Exception:
        devices = np.asarray(jax.devices()).reshape(n_proc, n_per)
    return Mesh(devices, (dcn_axis, ici_axis))


def replicate_to_global(x, mesh, spec=None):
    """Host value (identical on every process) -> global array on `mesh`.

    spec=None replicates; a PartitionSpec shards (each process must hold
    the FULL value; jax slices out the addressable shards).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, spec if spec is not None
                             else PartitionSpec())
    return jax.device_put(x, sharding)
