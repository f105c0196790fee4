# vasp_tpu runtime image (reference: Dockerfile at the repo root — conda
# env with FEniCS/vmtk; here a slim python image with the JAX CPU wheel.
# For TPU VMs install jax[tpu] from the libtpu releases index instead.)
FROM python:3.11-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/vasp_tpu
COPY pyproject.toml README.md ./
COPY vasp_tpu ./vasp_tpu
COPY docs ./docs

RUN python -m pip install --no-cache-dir --upgrade pip \
    && python -m pip install --no-cache-dir \
        jax flax optax chex einops numpy scipy h5py matplotlib \
    && python -m pip install --no-cache-dir -e . --no-deps \
    && make -C vasp_tpu/native || true

ENV JAX_PLATFORMS=cpu
CMD ["vasp-tpu-run", "--help"]
