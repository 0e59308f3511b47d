# orama_core_tpu deployment image (counterpart of the reference's
# Dockerfile, /root/reference/Dockerfile:1 — their Rust engine + Python AI
# sidecar collapse here into one Python process whose compute runs through
# JAX/XLA; the native C++ text pipeline compiles at build time).
#
# CPU serving:  docker build -t oramax . && ./docker.sh start
# TPU serving:  docker build --build-arg JAX_VARIANT="jax[tpu]" -t oramax .
#               on a TPU VM (libtpu comes from the host runtime; run with
#               --privileged --net=host per the TPU VM docs).
ARG PYTHON_VERSION=3.11
FROM python:${PYTHON_VERSION}-slim

# g++ compiles the native tokenizer/stemmer/CSR packer on first import
# (orama_core_tpu/native/__init__.py builds liboramax.so next to its
# source; pure-Python fallback if unavailable)
RUN apt-get update && apt-get install -y --no-install-recommends g++ \
  && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY orama_core_tpu/ orama_core_tpu/

ARG JAX_VARIANT="jax"
RUN pip install --no-cache-dir "${JAX_VARIANT}" && \
    pip install --no-cache-dir . && \
    # optional extras: Snowball stemmers for the non-EN locales
    pip install --no-cache-dir nltk snowballstemmer || true && \
    # pre-build the native library so first boot doesn't pay the compile
    python -c "from orama_core_tpu import native; print('native:', native.available())"

COPY config.example.yaml /app/config.yaml
COPY otel/ /app/otel/

RUN useradd --create-home oramax && chown -R oramax /app
USER oramax

ENV CONFIG_PATH=/app/config.yaml
EXPOSE 8080
HEALTHCHECK --interval=30s --timeout=5s \
  CMD python -c "import urllib.request; urllib.request.urlopen('http://127.0.0.1:8080/health', timeout=3)" || exit 1

CMD ["python", "-m", "orama_core_tpu", "--config", "/app/config.yaml"]
