# Hermetic dev/CI image for vectordb_tpu — the container analogue of the
# reference's Nix flake (flake.nix:18-36): a pinned toolchain provided,
# not assumed. CPU-only by default (the test suite runs on a virtual
# 8-device CPU mesh); for TPU hosts install the matching jax[tpu] wheel
# instead (see tools/provision.sh).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/vectordb_tpu
COPY pyproject.toml tools/ ./
COPY tools tools
RUN python -m pip install --no-cache-dir \
        "jax==0.9.0" "jaxlib==0.9.0" "numpy==2.0.2" "ml_dtypes==0.5.4" \
        "pytest==8.4.2" "hypothesis==6.142.1"

COPY . .
# build the native persistence core once (g++, cached in the layer) and
# verify the environment against the pins
RUN python -c "import sys; sys.path.insert(0, '.'); \
from vectordb_tpu.persistence.native_lib import get_native; \
assert get_native() is not None, 'native build failed'" \
    && python tools/check_env.py

# run the suite on the virtual 8-device CPU mesh
ENV XLA_FLAGS=--xla_force_host_platform_device_count=8
CMD ["python", "-m", "pytest", "tests/", "-q"]
