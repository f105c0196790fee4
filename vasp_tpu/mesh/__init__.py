from vasp_tpu.mesh.tetmesh import TetMesh  # noqa: F401
from vasp_tpu.mesh.io import read_vasp_mesh, write_vasp_mesh  # noqa: F401
