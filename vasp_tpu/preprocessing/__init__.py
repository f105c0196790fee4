"""Preprocessing: surface -> FSI volume mesh pipeline (offline, host-side).

The reference's preprocessing (SURVEY.md §2.1 P1-P4) drives VMTK/VTK/TetGen
C++ binaries. Those geometry engines are not available in this environment;
this package reproduces the *pipeline logic* — sizing functions, solid
thickness models, two-domain FSI marker assignment, boundary flattening,
probe generation, mesh metadata — over (a) the parametric generators in
vasp_tpu.mesh.generate and (b) VTK/VMTK when importable (gated)."""
