#!/bin/bash
# One-command hardware validation queue (ROADMAP item 8).
#
# Run on a machine where the axon TPU answers (jax.default_backend()=="tpu"
# within ~60 s). Order matters: correctness first, then the perf A/Bs that
# decide env-var defaults, then the flagship bench. NEVER run two of these
# concurrently — a client killed mid-claim can wedge the chip grant for
# hours (see ROADMAP note / memory).
#
#   bash scripts/hw_session.sh [stage ...]     # default: all stages
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:.
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

STAGES=${*:-verify attn probe_fused probe_w3 batch serve prefix kv8 chunked bench}
FAILED=0

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== [$name] $*" >&2
  timeout "$t" "$@" 2>&1 | tee "/tmp/hw_${name}.log" | tail -20
  local rc=${PIPESTATUS[0]}
  echo "=== [$name] exit $rc" >&2
  if [ "$rc" -ne 0 ]; then
    FAILED=1
    if [ "$name" = verify ]; then
      # correctness gates perf: numbers from kernels just shown wrong
      # (or a dead chip) are worse than no numbers
      echo "=== verify FAILED — aborting the perf stages" >&2
      exit 1
    fi
  fi
}

for s in $STAGES; do
  case $s in
    verify)      # all kernels incl. decode_attn/rope/paged_verify/flash
      run verify 2400 python -u scripts/tpu_verify.py ;;
    attn)        # model-level fused-vs-XLA attention parity (1-layer,
                 # bit-level cache checks; MHA/GQA/f32/bf16/int8/sliding)
      run attn 2400 python -u scripts/hw_attn_check.py ;;
    probe_fused) # fused attention A/B, scan vs engine protocol, w4
      SQUEEZELLM_FUSED_ATTN=1 run probe_f1 3000 python -u scripts/decode_probe.py \
          --variants pallasbf16-s45-bf16act-fused pallasbf16-s45-bf16act-fused-eng --steps 64
      SQUEEZELLM_FUSED_ATTN=0 run probe_f0 3000 python -u scripts/decode_probe.py \
          --variants pallasbf16-s45-bf16act-fused pallasbf16-s45-bf16act-fused-eng --steps 64 ;;
    probe_w3)    # w3 flagship-adjacent numbers with the fused kernels
      run probe_w3 3000 python -u scripts/decode_probe.py \
          --variants pallasbf16-s45-w3-bf16act-fused pallasbf16-s45-w3-bf16act-fused-eng --steps 64 ;;
    batch)       # batched-decode anomaly: a 16-slot step measured ~4x a
                 # batch-1 step though weights stream once either way
      for b in 1 8 16; do
        run "batch$b" 2400 python -u scripts/decode_probe.py \
            --variants pallasbf16-s45-bf16act-fused --steps 32 --batch "$b"
      done ;;
    serve)       # serving ladders incl. spec (paged + dense)
      run serve 3600 python -u scripts/serve_probe.py 8 16
      run serve_paged 3600 python -u scripts/serve_probe.py --paged 8 16
      run serve_spec 3600 python -u scripts/serve_probe.py --spec 8
      SQUEEZELLM_DENSE_WINDOW=chained run serve_chained 3600 \
          python -u scripts/serve_probe.py 8 ;;
    prefix)      # prefix sharing (round 4: 266 vs 149 tok/s; admissions
                 # must NOT be fenced per-request — see serve_probe)
      run admission 3600 python -u scripts/admission_probe.py
      run prefix 3600 python -u scripts/serve_probe.py --prefix ;;
    kv8)         # int8 KV pool: attention bytes A/B at full context
      run kv8 2400 python -u scripts/kv8_probe.py ;;
    chunked)     # chunked admission: emit-gap p95 whole vs chunk64
      run chunked 3600 python -u scripts/serve_probe.py --chunked ;;
    bench)       # flagship (fused attention ON by default)
      run bench 3600 python bench.py ;;
    *) echo "unknown stage $s" >&2; FAILED=1 ;;
  esac
done
exit $FAILED
