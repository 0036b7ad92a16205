"""Multi-host execution: jax.distributed initialization + process-spanning
meshes for the distributed Schur BA.

The reference is strictly single-process (SURVEY.md section 2.4: no
MPI/NCCL/anything — its only concurrency is 4 threads). This module is the
TPU-native scale-out path BASELINE.json asks for ("≥0.7 scaling efficiency
on 2+ hosts"): each host runs one process, `jax.distributed.initialize`
forms the global runtime, and a process-spanning `Mesh` over ALL devices
feeds the landmark-sharded BA in parallel/dist_ba.py UNCHANGED — the psum /
reduce_scatter collectives ride ICI within a host and DCN across hosts.

On real TPU pods: one process per host, devices discovered automatically.
For CI/smoke coverage without hardware: multiple CPU processes with gloo
collectives (tools/run_multihost.py + tests/test_multihost.py).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    cpu_devices_per_process: int | None = None,
):
    """Initialize the distributed runtime.

    On TPU pods, call with no arguments (auto-discovery via the TPU
    metadata). For CPU multi-process runs, pass coordinator/num/pid and
    a per-process virtual device count; collectives go through gloo.
    """
    if cpu_devices_per_process is not None:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={cpu_devices_per_process}"
            )
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if coordinator is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def global_mesh(axis: str = "lm") -> Mesh:
    """1-D mesh over every device of every process, ordered by process
    then local device — contiguous landmark blocks land host-local, so the
    heavy per-shard work never crosses DCN."""
    return Mesh(np.array(jax.devices()), (axis,))


def put_global(x, mesh: Mesh, spec: P):
    """Place a host array (identical on every process) as a global array
    with the given sharding. Works in single- and multi-process runs."""
    sharding = NamedSharding(mesh, spec)
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def put_problem_vision(state, obs, mesh: Mesh, axis: str = "lm"):
    """Shard a VisionBAState + BAObservations onto a (possibly
    process-spanning) mesh: points/observations along `axis`, cameras
    replicated — the placement contract of dist_ba."""
    from ..solver.ba import VisionBAState

    state = VisionBAState(
        Rcw=put_global(state.Rcw, mesh, P()),
        tcw=put_global(state.tcw, mesh, P()),
        points=put_global(state.points, mesh, P(axis)),
    )
    obs = jax.tree.map(lambda a: put_global(a, mesh, P(axis)), obs)
    return state, obs
