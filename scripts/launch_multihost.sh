#!/usr/bin/env bash
# Multi-host launcher for param-tpu benchmarks (the torchx_run.sh/mpirun
# analogue; reference: train/comms/pt/README.md:20-70).
#
# JAX TPU pods self-discover their topology, so on Cloud TPU VMs you simply
# run the same command on every worker:
#
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="cd param-tpu && bash scripts/launch_multihost.sh \
#                python -m param_tpu.cli.comms --collective all_reduce --e 256M"
#
# On non-TPU clusters (CPU/GPU), set the coordinator explicitly:
#
#   COORDINATOR=host0:9876 NPROCS=4 PROC_ID=$SLURM_PROCID \
#     bash scripts/launch_multihost.sh python -m param_tpu.cli.comms ...
#
# (jax.distributed.initialize is called by TpuBackend when COORDINATOR is
# exported; on TPU pods it is unnecessary.)
set -euo pipefail

if [[ -n "${COORDINATOR:-}" ]]; then
  export JAX_COORDINATOR_ADDRESS="$COORDINATOR"
  export JAX_NUM_PROCESSES="${NPROCS:?set NPROCS}"
  export JAX_PROCESS_ID="${PROC_ID:?set PROC_ID}"
fi

exec "$@"
