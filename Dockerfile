# Pinned environment for the TPU-native Monte Carlo risk engine.
# Counterpart of the reference container (reference Dockerfile:1-36), with the
# accelerator wheel selected by build arg: the default "cpu" image runs the
# whole correctness suite on a virtual 8-device CPU mesh (tests/conftest.py);
# JAX_CHANNEL=tpu installs the libtpu wheel for Cloud TPU VMs.
#
#   docker build --target test .                 # CPU: run the test suite
#   docker build --build-arg JAX_CHANNEL=tpu .   # TPU runtime image

# ---- base ----
FROM python:3.12-slim AS base
ENV DEBIAN_FRONTEND=noninteractive \
    PYTHONDONTWRITEBYTECODE=1 \
    PYTHONUNBUFFERED=1 \
    PIP_NO_CACHE_DIR=1
ARG JAX_CHANNEL=cpu   # "cpu" (default) or "tpu"

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential g++ pkg-config ca-certificates curl \
 && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY montecarlo_risk_engine_tpu ./montecarlo_risk_engine_tpu

RUN pip install --upgrade pip && \
    if [ "$JAX_CHANNEL" = "tpu" ]; then \
      pip install --no-cache-dir "jax[tpu]>=0.4.30" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html; \
    fi && \
    pip install --no-cache-dir -e .[test,data]

COPY . .

# ---- test ----
FROM base AS test
ENV PYTHONPATH=/app JAX_PLATFORMS=cpu
RUN python -m pytest -q tests/

# ---- runtime ----
FROM base AS runtime
CMD ["python", "-c", "import jax; print('JAX:', jax.__version__, '| backend:', jax.default_backend(), '| devices:', jax.device_count())"]
