#!/usr/bin/env bash
# Build/run helper (counterpart of the reference's docker.sh).
#   ./docker.sh build          # CPU image
#   ./docker.sh build-tpu      # TPU image (run on a TPU VM)
#   ./docker.sh start          # serve on :8080 with ./config.yaml mounted
set -euo pipefail

cmd="${1:-start}"
case "$cmd" in
  build)
    docker build -t oramax .
    ;;
  build-tpu)
    docker build --build-arg JAX_VARIANT="jax[tpu]" -t oramax .
    ;;
  start)
    cfg="${2:-./config.example.yaml}"
    exec docker run -it \
      -p 8080:8080 \
      -v "$(cd "$(dirname "$cfg")" && pwd)/$(basename "$cfg")":/app/config.yaml \
      -v oramax-data:/app/.data \
      oramax
    ;;
  start-tpu)
    cfg="${2:-./config.example.yaml}"
    # TPU VMs: the container needs the accelerator devices + host network
    exec docker run -it --privileged --net=host \
      -v "$(cd "$(dirname "$cfg")" && pwd)/$(basename "$cfg")":/app/config.yaml \
      -v oramax-data:/app/.data \
      oramax
    ;;
  *)
    echo "usage: ./docker.sh [build|build-tpu|start|start-tpu] [config.yaml]" >&2
    exit 2
    ;;
esac
