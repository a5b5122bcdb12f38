#!/usr/bin/env bash
# One-shot hardware measurement batch: run when the TPU tunnel is alive.
# Probe first (60s): a dead tunnel black-holes backend init for ~20 min.
#
#   bash scripts/tpu_roundup.sh [outdir]
#
# Produces, under outdir (default docs/hw_roundup):
#   probe.txt        tunnel health + device list
#   kernels.txt      real-TPU Pallas kernel suite (incl. quantized cache)
#   bench.jsonl      all bench.py configs (one JSON line each)
#   train_batch.txt  train-step batch scaling (b=1/2/4) at 224/20-view
set -u
cd "$(dirname "$0")/.."
OUT="${1:-docs/hw_roundup}"
mkdir -p "$OUT"

echo "== probe =="
if ! timeout 90 python -c "import jax,time; t=time.time(); d=jax.devices(); \
import jax.numpy as jnp; (jnp.ones((512,512))@jnp.ones((512,512))).block_until_ready(); \
print('ALIVE', d, round(time.time()-t,1))" > "$OUT/probe.txt" 2>&1; then
  echo "TPU tunnel not reachable (see $OUT/probe.txt) -- aborting early"
  exit 3
fi
cat "$OUT/probe.txt"

echo "== driver entry compile check =="
timeout 2400 python -c "import __graft_entry__ as g, jax, time; fn, a = g.entry(); \
t=time.time(); jax.jit(fn)(*a); print('entry OK', round(time.time()-t,1), 's')" \
  2>&1 | tail -2

echo "== real-TPU kernel suite =="
JAX_REAL_TPU=1 timeout 3600 python -m pytest tests/test_tpu_kernels.py -q \
  > "$OUT/kernels.txt" 2>&1
tail -2 "$OUT/kernels.txt"

echo "== bench (all configs) =="
timeout 5400 python bench.py > "$OUT/bench.jsonl" 2> "$OUT/bench.err"
cat "$OUT/bench.jsonl"

echo "== train-step batch scaling =="
for b in 1 2 4; do
  echo "--- batch $b ---"
  timeout 2400 python scripts/profile_train.py --batch "$b" 2>&1 | tail -8
done | tee "$OUT/train_batch.txt"

echo "== 224 2-view spread (3 driver-style invocations) =="
# VERDICT r4 item 1: the official record needs spread <10% across
# driver-style runs; each invocation is a fresh process like the driver's
for i in 1 2 3; do
  timeout 1800 python bench.py two_view_224 2>>"$OUT/bench_spread.err"
done | tee "$OUT/bench_spread.jsonl"

echo "== train-step per-op trace =="
# VERDICT r4 item 2 evidence: the per-op floor behind the it/s number
timeout 2400 python scripts/profile_train.py --trace /tmp/tr_train 2>&1 | tail -6
python scripts/trace_summary.py /tmp/tr_train --top 40 \
  > "$OUT/train_trace.txt" 2>&1 || tail -3 "$OUT/train_trace.txt"
tail -12 "$OUT/train_trace.txt"

echo "roundup complete: $OUT"
