"""Multi-host bootstrap: ``jax.distributed`` process-group initialization.

The reference scales across nodes with MPI (``mpirun -np N turtleFSI ...``;
DOLFIN partitions the mesh per rank and PETSc/MUMPS solve over MPI —
reference: docs/offset_stenosis.md:183-187, SURVEY.md §2.4). The TPU-native
analogue is one *process per host* attached to its local chips, joined into
a single JAX runtime by ``jax.distributed.initialize`` — after which
``jax.devices()`` is global and every ``shard_map``/``pjit`` program in
``parallel/shard.py`` and ``parallel/banded_shard.py`` runs unchanged over
the full slice: XLA routes intra-host collectives over ICI and cross-host
ones over DCN.

Call :func:`distributed_init` once at entry (the CLI driver does this when
``VASP_DIST=1`` or any of the standard coordinator env vars are present).
On TPU pods all parameters auto-detect from the TPU metadata; elsewhere the
standard triplet is read from the environment:

- ``VASP_COORDINATOR`` (or ``JAX_COORDINATOR_ADDRESS``): ``host:port`` of
  process 0,
- ``VASP_NUM_PROCESSES`` / ``VASP_PROCESS_ID`` (fall back to the common
  launcher vars ``SLURM_NTASKS``/``SLURM_PROCID`` or
  ``OMPI_COMM_WORLD_SIZE``/``OMPI_COMM_WORLD_RANK``).

Single-process runs (the common case, and all tests) are a no-op.
"""
import os

import jax
import numpy as np

_INITIALIZED = False


def _env_int(*names):
    for n in names:
        v = os.environ.get(n)
        if v is not None:
            return int(v)
    return None


def distributed_init(coordinator=None, num_processes=None, process_id=None,
                     verbose=True):
    """Join (or skip joining) a multi-host JAX process group.

    Explicit arguments win; otherwise the environment is consulted (see
    module docstring). Returns True when a multi-process group was
    initialized, False for the single-process no-op. Safe to call more
    than once."""
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator = coordinator or os.environ.get(
        "VASP_COORDINATOR", os.environ.get("JAX_COORDINATOR_ADDRESS"))
    num_processes = (num_processes if num_processes is not None
                     else _env_int("VASP_NUM_PROCESSES", "SLURM_NTASKS",
                                   "OMPI_COMM_WORLD_SIZE"))
    process_id = (process_id if process_id is not None
                  else _env_int("VASP_PROCESS_ID", "SLURM_PROCID",
                                "OMPI_COMM_WORLD_RANK"))

    on_tpu_pod = any(k in os.environ for k in
                     ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    explicit = coordinator is not None and num_processes is not None \
        and process_id is not None
    if not (explicit or (on_tpu_pod and os.environ.get("VASP_DIST") == "1")):
        if num_processes not in (None, 1):
            raise RuntimeError(
                f"multi-host run requested (num_processes={num_processes}) "
                "but no coordinator address: set VASP_COORDINATOR=host:port "
                "and VASP_PROCESS_ID")
        return False

    if explicit:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:  # TPU pod: every parameter auto-detects from the TPU metadata
        jax.distributed.initialize()
    _INITIALIZED = True
    if verbose and jax.process_index() == 0:
        print(f"jax.distributed: {jax.process_count()} processes, "
              f"{jax.device_count()} global devices "
              f"({jax.local_device_count()} local)")
    return True


def global_device_mesh(axis_name="dof"):
    """1-D mesh over ALL global devices, host-major.

    Host-major order keeps each process's local chips contiguous along the
    axis, so the dof-contiguous sharding of ``parallel/banded_shard.py``
    puts neighbouring block rows on the same host: the per-matvec halo
    ``ppermute`` crosses DCN only at the n_hosts-1 process seams while the
    bulk rides ICI (scaling-book recipe: collectives on the fast axis)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return jax.sharding.Mesh(np.array(devs), (axis_name,))
