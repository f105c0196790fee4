"""Multi-host bootstrap (vasp_tpu/parallel/bootstrap.py).

Single-process semantics are fully testable: the no-op path, the env-var
validation, and the host-major global mesh over the 8 virtual devices
(conftest forces JAX_PLATFORMS=cpu with xla_force_host_platform_device_count=8).
"""
import jax
import numpy as np
import pytest

from vasp_tpu.parallel import bootstrap


def test_single_process_noop(monkeypatch):
    for k in ("VASP_COORDINATOR", "JAX_COORDINATOR_ADDRESS",
              "VASP_NUM_PROCESSES", "VASP_PROCESS_ID", "VASP_DIST"):
        monkeypatch.delenv(k, raising=False)
    assert bootstrap.distributed_init() is False
    assert bootstrap._INITIALIZED is False


def test_partial_env_is_an_error(monkeypatch):
    monkeypatch.delenv("VASP_COORDINATOR", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("VASP_NUM_PROCESSES", "4")
    monkeypatch.delenv("VASP_PROCESS_ID", raising=False)
    with pytest.raises(RuntimeError, match="coordinator"):
        bootstrap.distributed_init()


def test_global_device_mesh_host_major():
    mesh = bootstrap.global_device_mesh("dof")
    assert mesh.axis_names == ("dof",)
    devs = list(mesh.devices.flat)
    assert len(devs) == len(jax.devices())
    # host-major: process_index non-decreasing along the axis, ids sorted
    # within a process (keeps banded_shard halos on-host except at seams)
    keys = [(d.process_index, d.id) for d in devs]
    assert keys == sorted(keys)

    # the mesh drives the production sharded stepper's axis layout
    from jax.sharding import NamedSharding, PartitionSpec as P
    x = jax.device_put(np.arange(16.0), NamedSharding(mesh, P("dof")))
    assert float(x.sum()) == 120.0
