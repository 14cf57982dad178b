#!/usr/bin/env bash
# On-chip measurement campaign — round 5: adjudicate what round 4 built.
# Run when the TPU tunnel is healthy (a trivial matmul completes in <60s);
# each stage appends to tpu_campaign.log. Numbers feed docs/PERF_NOTES.md
# and BENCH; all labs now report MEDIANS of interleaved reps (steady
# state), not best-of tails.
#
# NOTE (methodology, docs/PERF_NOTES.md): if any compile takes >120s the
# remote compile service is backed up — discard that stage's numbers and
# re-run later.  Do NOT run CPU-heavy jobs (pytest) concurrently: the box
# has ONE core and host stalls pollute the slope windows.
set -u
cd "$(dirname "$0")/.."
LOG=tpu_campaign.log
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${STAGE_TIMEOUT:-1800}" "$@" 2>&1 | tee -a "$LOG"
}

# 0. tunnel health
timeout 90 python -c "
import jax, jax.numpy as jnp
(jnp.ones((1024,1024),jnp.bfloat16)@jnp.ones((1024,1024),jnp.bfloat16)).block_until_ready()
print('tunnel healthy:', jax.devices()[0])" | tee -a "$LOG" || {
  echo "TUNNEL DOWN - aborting campaign" | tee -a "$LOG"; exit 1; }

# 1. headline-kernel compute attribution + submask race (VERDICT r4
#    item 4: where do the ~8 us over the DMA probe go?)
run python scripts/lab_ablate.py 5

# 2. headline BENCH shape through dispatch (median + best + uniform NMSE)
run python bench.py

# 3. serving decode step: fused-vs-unfused END-TO-END adjudication
#    (VERDICT r3 item 2) at short ctx, then the ctx-896 q8 config
run python scripts/bench_serve.py --steps 64 --fast-init --mega on
run python scripts/bench_serve.py --steps 64 --fast-init --mega off
run python scripts/bench_serve.py --steps 64 --kv q8 --ctx 896 --fast-init

# 4. ring cache at long context vs linear windowed (same window) —
#    round-3 crash fixed: bench_serve now chunks prefill by ring_chunk
run python scripts/bench_serve.py --steps 64 --seq 4096 --window 1024 --ctx 3500 --kv q8 --fast-init
run python scripts/bench_serve.py --steps 64 --seq 4096 --window 1024 --ring --ctx 3500 --kv q8 --fast-init

# 5. the all-formats llama-shape perf matrix (VERDICT r4 item 3; reference
#    tests/test_llama_shapes.cu:247-290).  One format per timeout window,
#    records merged into BENCH_SUITE_r05.json
for fmt in q4_0 q8_0 q4_1 q5_0 q5_1 q4_k q5_k; do
  run python scripts/bench_suite.py --format "$fmt" \
      --out BENCH_SUITE_r05.json --append
done

# 6. serving-shape GEMM races: m=8 tile grid + exact-vs-dequant rungs
run python scripts/lab_serve8.py 5
run python scripts/lab_dequant8.py

# 7. decode-step component breakdown, TWICE back-to-back (VERDICT r4
#    item 7 done-condition: rows agree within +-10%, no impossible rows)
run python scripts/profile_decode.py --strict
run python scripts/profile_decode.py --strict

# 8. per-16 K-quant decode kernel (q6_k lm-head-sized GEMM)
run python scripts/perf_lab.py 4

# 9. decode-attention variant sweep
run python scripts/bench_attn.py

# 10. model stack on silicon (VERDICT r3 item 6): pinned greedy transcript
#     on the TPU backend vs the CPU one, plus one HTTP server request
run bash scripts/onchip_model_check.sh

echo "campaign complete: see $LOG"
