ARG UBUNTU_VERSION=24.04
ARG PYTHON_VERSION=3.12

# ---------------------------------------------------------------------------
# Build stage: compile the C sidecar (csrc/fastcmp) and install the package.
# TPU-native analogue of the reference image (/root/reference/Dockerfile):
# no CUDA toolchain — the accelerator stack is jax[tpu]/libtpu, which ships
# as a pip wheel, so the base image is plain Ubuntu.
# ---------------------------------------------------------------------------
FROM ubuntu:${UBUNTU_VERSION} AS builder

ARG PYTHON_VERSION

RUN apt-get update && apt-get install -y --no-install-recommends \
    python${PYTHON_VERSION} \
    python${PYTHON_VERSION}-dev \
    python${PYTHON_VERSION}-venv \
    python3-pip \
    build-essential \
    curl \
    && rm -rf /var/lib/apt/lists/*

RUN curl -LsSf https://astral.sh/uv/install.sh | sh
ENV PATH="/root/.local/bin:${PATH}"

WORKDIR /app

COPY pyproject.toml README.md ./
COPY minisgl_tpu/ ./minisgl_tpu/
COPY csrc/ ./csrc/
COPY assets/ ./assets/

# jax[tpu] pulls libtpu from the Google release index; the rest comes from
# the project metadata. fastcmp is an optional dlopen'd sidecar — build it
# here so the radix cache gets the fast path (utils/compare.py falls back to
# numpy when the .so is absent).
RUN uv venv --python=python${PYTHON_VERSION} /app/.venv \
    && . /app/.venv/bin/activate \
    && uv pip install -e . \
    && uv pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && make -C csrc

# ---------------------------------------------------------------------------
# Runtime stage
# ---------------------------------------------------------------------------
FROM ubuntu:${UBUNTU_VERSION} AS runtime

ARG PYTHON_VERSION

RUN apt-get update && apt-get install -y --no-install-recommends \
    python${PYTHON_VERSION} \
    python${PYTHON_VERSION}-venv \
    && rm -rf /var/lib/apt/lists/*

RUN useradd --create-home --shell /bin/bash --uid 1001 minisgl

COPY --from=builder --chown=minisgl:minisgl /app /app

# Cache dirs: HF checkpoints + the persistent XLA compile cache (engine
# warmup compiles dozens of step-bucket variants; the cache makes restarts
# pay zero recompilation — engine.py _enable_compile_cache).
RUN mkdir -p /app/.cache/huggingface /app/.cache/jax_comp \
    && chown -R minisgl:minisgl /app/.cache

WORKDIR /app

ENV PATH="/app/.venv/bin:${PATH}"
ENV PYTHONUNBUFFERED=1
ENV HF_HOME=/app/.cache/huggingface
ENV JAX_COMPILATION_CACHE_DIR=/app/.cache/jax_comp

USER minisgl

EXPOSE 1919

ENTRYPOINT ["python", "-m", "minisgl_tpu"]
CMD ["--help"]
