"""vasp_tpu — a TPU-native vascular fluid–structure interaction (FSI) framework.

A from-scratch reimplementation of the capabilities of KVSlab/VaSP *and* the
numerical core VaSP delegates to turtleFSI/FEniCS, designed TPU-first:

- unstructured tetrahedral FEM core as batched JAX element kernels
  (gather -> vmapped element residual -> segment-sum scatter),
- monolithic ALE FSI (Taylor-Hood P2/P1 fluid + P2 hyperelastic solid),
  theta-scheme time integration, damped Newton with Jacobian reuse,
  matrix-free Krylov linear solves,
- multi-chip scaling via jax.sharding / shard_map over a device mesh
  (domain decomposition with halo DOF exchange),
- hemodynamics / spectral postprocessing as batched JAX kernels over
  node x time matrices.

Reference behavior: KVSlab/VaSP (see SURVEY.md at the repo root); citations
in docstrings use ``reference:<path>:<line>`` pointing into the reference
checkout used for behavioral parity.
"""
from vasp_tpu.utils.jaxconfig import ensure_x64

__version__ = "0.1.0"

# Double precision is a hard requirement of the solver contract
# (Newton atol down to 1e-10; reference: src/vasp/simulations/aneurysm.py:48-49).
ensure_x64()
