"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware, and double precision everywhere."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import numpy as np  # noqa: E402

from vasp_tpu.mesh.generate import fsi_tube_mesh  # noqa: E402

REFERENCE_DATA = "/root/reference/tests/test_data"


@pytest.fixture(scope="session")
def tiny_tube():
    """A small FSI tube mesh used across solver tests."""
    return fsi_tube_mesh(n_theta=12, n_r_fluid=2, n_r_solid=1, n_z=8)


@pytest.fixture(scope="session")
def reference_cylinder_path():
    path = os.path.join(REFERENCE_DATA, "cylinder", "cylinder.h5")
    if not os.path.exists(path):
        pytest.skip("reference test data not available")
    return path
