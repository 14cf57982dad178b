#!/bin/bash
# Round-5 addendum: clean re-runs of the stages that overlapped the slow
# pytest suite (the box has ONE core; concurrent host load pollutes step
# timings — see docs/PERF_NOTES.md methodology), plus the QGT_SUBMASK A/B
# and lab_dequant8 which the resilient runner dropped.
# Waits for the resilient campaign (if still running) before starting.
cd /root/repo
LOG=tpu_campaign.log


PROBE_N=2000
probe() {
  PROBE_N=$((PROBE_N + 8))
  timeout 150 python -c "
import jax, jax.numpy as jnp
d = $PROBE_N
x = jnp.ones((d, d), jnp.bfloat16)
(x @ x).block_until_ready()" > /dev/null 2>&1
}
stage() {
  for attempt in 1 2 3; do
    n=0
    until probe; do
      n=$((n + 1)); echo "addendum [$*] probe wait $n $(date -u +%H:%M:%S)" >> /tmp/campaign_poll.log
      sleep 180
      [ $n -ge 40 ] && { echo "PROBE GAVE UP for $*" | tee -a "$LOG"; return 1; }
    done
    echo "=== ADDENDUM $* (attempt $attempt, $(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
    timeout "${STAGE_TIMEOUT:-2700}" "$@" 2>&1 | tee -a "$LOG"
    rc=${PIPESTATUS[0]}
    [ "$rc" = "0" ] && return 0
    echo "--- addendum stage failed rc=$rc, retrying ---" | tee -a "$LOG"
  done
  return 1
}
# q4_1 matrix re-record: its 12:28-12:48 stage overlapped host CPU work
# (medians 2-3x best across the block = host-stall pollution)
stage python scripts/bench_suite.py --format q4_1 --out BENCH_SUITE_r05.json --append
stage python scripts/bench_suite.py --format q4_k --out BENCH_SUITE_r05.json --append
# (control bench.py already ran 13:58: median 51.3)
# headline knob A/B: submask (ablate said -0.5 us) and bundle (fused
# activation-prep operand — the glue the ablation put at ~3-4 us/call)
stage env QGT_SUBMASK=1 python bench.py
stage env QGT_BUNDLE=1 python bench.py
stage env QGT_BUNDLE=1 QGT_SUBMASK=1 python bench.py
stage env QGT_BUNDLE=1 python bench.py
stage python bench.py
# clean serving A/B, twice each (today's 11:38/12:04 runs overlapped pytest)
stage python scripts/bench_serve.py --steps 64 --fast-init --mega on
stage python scripts/bench_serve.py --steps 64 --fast-init --mega off
stage python scripts/bench_serve.py --steps 64 --fast-init --mega on
stage python scripts/bench_serve.py --steps 64 --fast-init --mega off
# clean ctx-896 q8 config (12:16 run overlapped pytest tail)
stage python scripts/bench_serve.py --steps 64 --kv q8 --ctx 896 --fast-init
# bundled activation prep end-to-end (per-GEMM glue x 4 dispatches/layer)
stage env QGT_BUNDLE=1 python scripts/bench_serve.py --steps 64 --fast-init --mega on
# dequant-rung race at the serving batch (dropped from the resilient list)
stage python scripts/lab_dequant8.py
echo "addendum complete $(date -u +%H:%M:%S)" | tee -a "$LOG"
