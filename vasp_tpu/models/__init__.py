"""Problem definitions (the reference's `simulations/` problem files,
rebuilt on the vasp_tpu hook protocol — SURVEY.md §2.1 S2-S6)."""
