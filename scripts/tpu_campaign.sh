#!/usr/bin/env bash
# On-chip measurement campaign for the round-2 kernel reformulations.
# Run when the TPU tunnel is healthy (a trivial matmul completes in <60s);
# each stage appends to tpu_campaign.log. Numbers feed docs/PERF_NOTES.md
# ("Round-2 kernel reformulations") and BENCH.
#
# NOTE (methodology, docs/PERF_NOTES.md): if any compile takes >120s the
# remote compile service is backed up — discard that stage's numbers and
# re-run later.
set -u
cd "$(dirname "$0")/.."
LOG=tpu_campaign.log
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout 1200 "$@" 2>&1 | tee -a "$LOG"
}

# 0. tunnel health
timeout 90 python -c "
import jax, jax.numpy as jnp
(jnp.ones((1024,1024),jnp.bfloat16)@jnp.ones((1024,1024),jnp.bfloat16)).block_until_ready()
print('tunnel healthy:', jax.devices()[0])" | tee -a "$LOG" || {
  echo "TUNNEL DOWN - aborting campaign" | tee -a "$LOG"; exit 1; }

# 1. x8 decode A/B: legacy unpack chain vs integrated kernel (VERDICT #1)
run python scripts/lab_x8.py 4
run python scripts/lab_x8.py 1

# 2. headline BENCH shape through dispatch (records the x8 exact kernel)
run python bench.py

# 3. serving decode step (fused exact kernel now on the decode path)
#    --fast-init: host numpy init took ~11 min of each 20-min stage budget
#    on this single-core box (all four serve stages timed out in the first
#    round-3 campaign run); on-device init takes seconds
run python scripts/bench_serve.py --steps 64 --fast-init
run python scripts/bench_serve.py --steps 64 --kv q8 --ctx 896 --fast-init

# 4. ring cache at long context vs linear windowed (same window)
run python scripts/bench_serve.py --steps 64 --seq 4096 --window 1024 --ctx 3500 --kv q8 --fast-init
run python scripts/bench_serve.py --steps 64 --seq 4096 --window 1024 --ring --ctx 3500 --kv q8 --fast-init

# 5. per-16 K-quant decode kernel (q6_k lm-head-sized GEMM)
run python scripts/perf_lab.py 4

# 6. decode-step component breakdown (serving-floor attack, VERDICT #5)
run python scripts/profile_decode.py

# 7. decode-attention variant sweep (ts / cache dtype / fold / ctx —
#    attacks whichever term stage 6 says dominates)
run python scripts/bench_attn.py

echo "campaign complete: see $LOG"
