#!/usr/bin/env bash
# Multi-host training launcher — the TPU analog of the reference's
# tools/dist_train.sh (torch.distributed.launch --nproc_per_node=8).
#
# On TPU there is ONE process per host (not per chip); jax addresses all
# local chips. On Cloud TPU pods, just run the same command on every host
# (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`):
#
#   bash tools/dist_train.sh workoutdetector_tpu/configs/repcount_12_tsm.yaml [opts...]
#
# On generic clusters set the rendezvous env first:
#   export JAX_COORDINATOR_ADDRESS=host0:8476
#   export JAX_NUM_PROCESSES=<hosts>
#   export JAX_PROCESS_ID=<this host's rank>
set -euo pipefail
CFG=${1:?usage: dist_train.sh <config.yaml> [opts...]}
shift || true
python - "$CFG" "$@" <<'PY'
import sys
from workoutdetector_tpu.parallel.distributed import initialize
initialize()  # no-op single host; DCN rendezvous on pods
from workoutdetector_tpu.trainer import main
main(["--cfg", sys.argv[1], *sys.argv[2:]])
PY
