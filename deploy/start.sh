#!/usr/bin/env bash
# Interactive dev box on a Cloud TPU VM — counterpart of the reference's
# docker/start.sh (GPU devbox): same volume/env layout, TPU passthrough
# instead of --gpus=all, plain bash instead of zsh.
set -euo pipefail

docker run -it \
  --privileged \
  --net=host \
  --shm-size=32gb \
  -u "$(id -u):$(id -g)" \
  -e PROJ_ROOT=/work \
  -e WANDB_API_KEY="${WANDB_API_KEY:-}" \
  --volume "$PWD:/work" \
  --volume "$HOME/data:/home/user/data:ro" \
  -w /work \
  --entrypoint bash \
  --name devbox \
  workoutdetector-tpu:latest
