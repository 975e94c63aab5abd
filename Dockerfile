# Runtime envelope for TPU VMs (reference ships a TF-GPU Dockerfile;
# this is the TPU-native equivalent).  Build on a TPU VM or any host for
# the CPU path.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/deepgrp_tpu
COPY pyproject.toml README.md ./
COPY deepgrp_tpu ./deepgrp_tpu
COPY examples ./examples

# On a TPU VM install `jax[tpu]` instead of the CPU extra.
RUN pip install --no-cache-dir -e . "jax[cpu]" optax h5py pandas scipy

# Pre-build the native host library.
RUN make -C deepgrp_tpu/native libdeepgrp_native.so

ENV OMP_NUM_THREADS=4
ENTRYPOINT ["python", "-m", "deepgrp_tpu"]
CMD ["--help"]
