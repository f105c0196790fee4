"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware, and double precision everywhere.

Note: some pytest plugins (jaxtyping) import jax before this conftest runs,
so env vars alone are too late — jax.config still works as long as no
backend has been initialized yet."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except AttributeError:  # older jax: XLA_FLAGS path above covers it
    pass
# persistent compile cache: the jacfwd element kernels take minutes to
# compile; repeat test runs hit the disk cache
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/jax_vasp_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
assert not jax._src.xla_bridge.backends_are_initialized(), (
    "a plugin initialized a JAX backend before conftest could force CPU"
)

import pytest  # noqa: E402
import numpy as np  # noqa: E402

from vasp_tpu.mesh.generate import fsi_tube_mesh  # noqa: E402

REFERENCE_DATA = "/root/reference/tests/test_data"


@pytest.fixture(scope="session")
def tiny_tube():
    """A small FSI tube mesh used across solver tests."""
    return fsi_tube_mesh(n_theta=12, n_r_fluid=2, n_r_solid=1, n_z=8)


@pytest.fixture(scope="session")
def cylinder_run(tmp_path_factory):
    """One shared end-to-end cylinder simulation (3 steps, save_deg=2)."""
    import io
    from contextlib import redirect_stdout

    from vasp_tpu.run.driver import run_simulation

    folder = tmp_path_factory.mktemp("cylinder_results")
    buf = io.StringIO()
    with redirect_stdout(buf):
        ns = run_simulation(
            "cylinder",
            overrides=dict(
                T=0.003, dt=0.001, folder=str(folder), mesh_path=None,
                quadrature_degree=3, save_deg=2, save_step=1,
                checkpoint_step=2, atol=1e-7, rtol=1e-7, recompute=5,
                recompute_tstep=1, verbose=True,
            ),
        )
    return ns, buf.getvalue(), folder


@pytest.fixture(scope="session")
def reference_cylinder_path():
    path = os.path.join(REFERENCE_DATA, "cylinder", "cylinder.h5")
    if not os.path.exists(path):
        pytest.skip("reference test data not available")
    return path
