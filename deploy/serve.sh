#!/usr/bin/env bash
# Serve a deployment artifact from the container (no reference analog —
# its serving ran uncontainerized via uvicorn; here the image's default
# entrypoint IS the server). Artifacts must live in one directory,
# mounted read-only at /models.
#
# Usage: deploy/serve.sh /path/to/model.jaxm [port] [repnet.jaxm-basename]
set -euo pipefail

ARTIFACT="${1:?usage: deploy/serve.sh model.jaxm [port] [repnet.jaxm]}"
PORT="${2:-8000}"
MODELS_DIR="$(dirname "$(readlink -f "$ARTIFACT")")"
EXTRA=()
if [ -n "${3:-}" ]; then
  # enables the live 'mode:count-periodic' WS mode
  EXTRA=(--repnet-checkpoint "/models/$(basename "$3")")
fi

docker run --rm -d \
  --privileged \
  --net=host \
  --volume "$MODELS_DIR:/models:ro" \
  --name wd-serve \
  workoutdetector-tpu:latest \
  --checkpoint "/models/$(basename "$ARTIFACT")" --port "$PORT" \
  "${EXTRA[@]}"
