#!/usr/bin/env bash
# One-shot containerized TRAINING run on a Cloud TPU VM — the TPU-native
# counterpart of the reference's docker/run.sh (its `--gpus=all` becomes
# TPU device passthrough: --privileged exposes /dev/accel* and
# --net=host lets multi-host pods rendezvous).
#
# Usage: deploy/run.sh [config.yaml] [dotted.overrides ...]
set -euo pipefail

CFG="${1:-workoutdetector_tpu/configs/repcount_12_tsm.yaml}"
shift || true

docker run --rm -it \
  --privileged \
  --net=host \
  --shm-size=16gb \
  -e PROJ_ROOT=/work \
  -e WANDB_API_KEY="${WANDB_API_KEY:-}" \
  --volume "$PWD:/work" \
  --volume "$HOME/data:/home/user/data:ro" \
  -w /work \
  --entrypoint python \
  workoutdetector-tpu:latest \
  -m workoutdetector_tpu.trainer --cfg "$CFG" "$@"
