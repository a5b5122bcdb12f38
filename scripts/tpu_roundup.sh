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

if [ "${2:-}" = "--full" ] || [ "${FULL:-0}" = "1" ]; then
  CKPT=/tmp/demo_train_224/checkpoint-final
  echo "== (full) continue 224 demo training to 40 epochs =="
  # resumes from checkpoint-last in /tmp/demo_train_224; better-conditioned
  # focal anchors come from a longer-trained net
  PYTHONPATH=. timeout 7200 python scripts/train_synthetic_demo.py 40 \
    --preset224 2>&1 | tail -4

  echo "== (full) focal-vs-GT + trained anchors (re-gen) =="
  # validate_reference.py replaces its own appended section idempotently
  # (same-heading strip inside write_report) -- no pre-strip needed here
  timeout 3600 python scripts/validate_reference.py --native_ckpt "$CKPT" \
    --res 224 2>&1 | tail -3
  timeout 3600 python scripts/validate_reference.py --native_ckpt "$CKPT" \
    --focal_gt --res 224 2>&1 | tail -3

  echo "== (full) flagship-512 VO soak (500 frames, quant parity) =="
  timeout 10800 python scripts/soak_vo.py --frames 500 --weights "$CKPT" \
    --res 512 --quant_parity --skip_video \
    --out docs/SOAK_VO_512.json 2>&1 | tail -12

  echo "== (full) quantized-cache capacity churn =="
  timeout 7200 python scripts/quant_accuracy.py --capacity --frames 220 \
    --ckpt "$CKPT" --out docs/QUANT_CAPACITY.json 2>&1 | tail -6

  echo "== (full) 7scenes-sized synthetic recon-eval dry-run =="
  timeout 7200 python eval.py --chkpt "$CKPT" --preset 224 \
    --dataset "SyntheticScenes(num_views=10, epoch_size=20, resolutions=((224,224),), render_hw=(224,224), seed=11)" \
    --num_views 4 10 --recon_eval --pose_eval \
    --output docs/EVAL_DRYRUN.json 2>&1 | tail -4
fi

echo "roundup complete: $OUT"
