#!/usr/bin/env bash
# Exercise every CLI end-to-end on the simulated 8-device CPU mesh.
# Usage: bash scripts/smoke_all.sh  (from the repo root; ~3-4 min)
set -euo pipefail
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"
export PYTHONPATH="$(pwd)"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

echo "== comms sweep (+dcheck, quantized, trace recording)"
python -m param_tpu.cli.comms --collective all_reduce,all_to_all --b 1K --e 4K \
  --n 4 --w 1 --c 1 --trace-dump "$TMP/comms_trace.json"
python -m param_tpu.cli.comms --collective all_reduce --b 1K --e 1K --n 3 \
  --bitwidth 8 --c 1

echo "== pt2pt"
python -m param_tpu.cli.comms --pt2pt one2one --b 1K --e 1K --n 3 --window 4

echo "== overlap"
python -m param_tpu.cli.overlap --collective all_reduce --collective-pair \
  all_to_all --b 64K --e 64K --chain 6
python -m param_tpu.cli.overlap --overlap-pair-pgs --b 64K --e 64K --chain 6

echo "== comms+compute"
python -m param_tpu.cli.comms_compute --kernel gemm --mm-dim 128 --b 64K --chain 6

echo "== replay (recorded trace + analysis)"
python -m param_tpu.cli.replay --trace-path "$TMP/comms_trace.json" --blocking \
  --analyze --output-path "$TMP/details.json"
python -m param_tpu.cli.analyze "$TMP/details.json" --world-size 8

echo "== dlrm bench + print-comms + replay + e2e train"
python -m param_tpu.cli.dlrm --num-tables 8 --rows 1000 --emb-dim 16 --nnz 4 \
  --dense-dim 16 --arch-mlp-bot 32-16 --arch-mlp-top 32-1 --batch 128 \
  --chain 3 --reps 1
python -m param_tpu.cli.dlrm --num-tables 8 --rows 1000 --emb-dim 16 --nnz 4 \
  --dense-dim 16 --arch-mlp-bot 32-16 --arch-mlp-top 32-1 --batch 128 \
  --print-comms "$TMP/dlrm_comms.json"
python -m param_tpu.cli.replay --trace-path "$TMP/dlrm_comms.json" --dry-run
python -m param_tpu.cli.dlrm --num-tables 8 --rows 1000 --emb-dim 16 --nnz 4 \
  --dense-dim 16 --arch-mlp-bot 32-16 --arch-mlp-top 32-1 --batch 128 \
  --train-batches 5

if [ -f /root/reference/et_replay/tests/inputs/dlrm_pytorch_et.tar.gz ]; then
  echo "== real reference production trace (PyTorch-ET)"
  mkdir -p "$TMP/refet"
  tar xzf /root/reference/et_replay/tests/inputs/dlrm_pytorch_et.tar.gz -C "$TMP/refet"
  python -m param_tpu.cli.replay --trace-path "$TMP/refet/dlrm_pytorch_et/dlrm_eg_0.json" \
    --trace-type pytorch_et --auto-shrink --dry-run
fi

echo "== scaling what-if estimator"
python -m param_tpu.cli.scaling --collective all_reduce --size 16M \
  --generation v5e --worlds 8 64 256
python -m param_tpu.cli.scaling --trace-path "$TMP/comms_trace.json" \
  --worlds 8 64 --json > /dev/null

if [ -f /root/reference/et_replay/tests/inputs/linear_et.json.gz ]; then
  echo "== pt-ET op replay (+bf16 what-if)"
  python -m param_tpu.cli.pt_et \
    --trace /root/reference/et_replay/tests/inputs/linear_et.json.gz \
    --max-ops 40 --top 5
  python -m param_tpu.cli.pt_et \
    --trace /root/reference/et_replay/tests/inputs/linear_et.json.gz \
    --max-ops 40 --cast bf16 --top 5
fi

echo "== pt-ET attention fusion what-if (fwd-only default + train mode)"
python -m param_tpu.cli.pt_et \
  --trace tests/fixtures/transformer_long_et.json.gz \
  --max-ops 30 --fuse attention --top 5
python -m param_tpu.cli.pt_et \
  --trace tests/fixtures/transformer_train_et.json.gz \
  --fuse attention-train --top 5

echo "== fused attention bench"
python -m param_tpu.cli.compute attention --shape 1,2,256,128 \
  --dtype float32 --paths xla,flash --chain 3 --reps 1
python -m param_tpu.cli.compute attention --shape 1,2,256,128 \
  --dtype float32 --paths flash --grad --chain 2 --reps 1

echo "== transformer-block train-step bench (flash_mha vs xla)"
python -m param_tpu.cli.compute transformer --shape 1,128,128,2,256 \
  --paths flash,xla --chain 2 --reps 1

echo "== serving decode bench (MHA + GQA)"
python -m param_tpu.cli.compute decode --shape 2,4,512,64 --chain 2 --reps 1
python -m param_tpu.cli.compute decode --shape 2,8,2,256,64 --chain 2 --reps 1
python -m param_tpu.cli.compute serve --shape 2,128,64,2,128 --chain 2 --reps 1
python -m param_tpu.cli.compute serve --shape 2,128,64,2,128 --dtype int8 --chain 2 --reps 1
python -m param_tpu.cli.compute serve --shape 2,128,64,2,128 --dtype int4 --chain 2 --reps 1

echo "== compute tier"
python -m param_tpu.cli.compute gemm --shape 64,64,64 --chain 3 --reps 1
python -m param_tpu.cli.cvt --layer stage0.block0.conv_proj_q \
  --forward-only --steps 2 --max-chain 4
python -m param_tpu.cli.compute emb --shape 1000,16,4,64 --chain 3 --reps 1
python -m param_tpu.cli.compute linear --shape 2,32,32,32,16 --chain 3 --reps 1
python -m param_tpu.cli.inference --shape 2,32,32,32,16 --dtype int8 --chain 3 --reps 1

echo "== execution traces"
python -m param_tpu.cli.et capture --workload dlrm_train -o "$TMP/et.json.gz"
python -m param_tpu.cli.et validate "$TMP/et.json.gz"
python -m param_tpu.cli.et replay "$TMP/et.json.gz" --iters 1 --warmup 0
python -m param_tpu.cli.et codegen "$TMP/et.json.gz" -o "$TMP/gen.py"
python "$TMP/gen.py"
python -m param_tpu.cli.replay --trace-path "$TMP/et.json.gz" --trace-type et --dry-run

echo "== operator micro-benchmark"
python -m param_tpu.cli.run_benchmark -c configs/basic_ops.json -o "$TMP/ops.jsonl"
python -m param_tpu.cli.run_benchmark -c configs/transformer_ops.json

echo "ALL SMOKE TESTS PASSED"
