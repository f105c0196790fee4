"""Postprocessing stack (the reference's postprocessing/ tree rebuilt as
batched JAX/numpy kernels over time-series outputs — SURVEY.md §2.1
PP/PF/PH/M components)."""
