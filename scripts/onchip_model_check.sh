#!/usr/bin/env bash
# Model stack on silicon (VERDICT r3 item 6): everything above the GEMMs
# (GGUF loader, tokenizer, sampling, serving loop, HTTP server) had only
# ever executed on the CPU backend.  This stage runs a pinned greedy
# generation on the TPU backend and diffs it against the CPU transcript,
# then serves one HTTP completion request on-chip.
#
# CPU-vs-TPU token equality holds on the tiny fixture because every GEMM
# is the exact integer kernel (bit-identical across backends) and the tiny
# model's logit gaps dwarf the attention kernels' f32-accumulation-order
# differences; a mismatch here means a real backend bug, not noise.
set -u
cd "$(dirname "$0")/.."
GGUF=tests/golden/tiny_llama_q4km.gguf
ARGS=(-m "$GGUF" -p "Once upon a time" -n 24 --temp 0)

echo "--- generate.py on CPU backend ---"
timeout 900 python scripts/generate.py "${ARGS[@]}" --cpu > /tmp/gen_cpu.txt \
  || { echo "CPU generation FAILED"; exit 1; }
cat /tmp/gen_cpu.txt

echo "--- generate.py on TPU backend ---"
timeout 900 python scripts/generate.py "${ARGS[@]}" > /tmp/gen_tpu.txt \
  || { echo "TPU generation FAILED"; exit 1; }
cat /tmp/gen_tpu.txt

if diff -q /tmp/gen_cpu.txt /tmp/gen_tpu.txt > /dev/null; then
  echo "TRANSCRIPTS MATCH (CPU == TPU, pinned greedy)"
else
  echo "TRANSCRIPT MISMATCH:"
  diff /tmp/gen_cpu.txt /tmp/gen_tpu.txt || true
  exit 1
fi

echo "--- HTTP server one-request smoke (TPU backend) ---"
timeout 900 python scripts/server.py -m "$GGUF" --port 18573 &
SRV=$!
trap 'kill $SRV 2>/dev/null' EXIT
for _ in $(seq 1 120); do
  curl -s -o /dev/null http://127.0.0.1:18573/health && break
  sleep 5
done
curl -s http://127.0.0.1:18573/completion \
  -d '{"prompt": "Once upon a time", "n_predict": 8, "temperature": 0}' \
  | head -c 400
echo
kill $SRV 2>/dev/null
wait $SRV 2>/dev/null
echo "server request done"
