from vasp_tpu.utils.jaxconfig import ensure_x64, default_float  # noqa: F401
