#!/bin/bash
# Ordered TPU work queue for the next tunnel window.  One process at a
# time, 95 s cooldown between claims, everything logged to /tmp/q_*.log.
set -u
cd /root/repo
Q() {  # Q <label> <timeout_s> <cmd...>
  local label=$1 t=$2; shift 2
  # yield the single tunnel claim to the round driver's own bench runs
  while ps aux | grep -Eq "[b]ench\.py|[_]_graft_entry__"; do sleep 120; done
  echo "=== $label start $(date +%H:%M:%S) ===" | tee -a /tmp/q_master.log
  timeout "$t" "$@" > "/tmp/q_${label}.log" 2>&1
  local rc=$?
  echo "=== $label rc=$rc $(date +%H:%M:%S) ===" | tee -a /tmp/q_master.log
  sleep 95
  return $rc
}

# 0. single probe: bail out fast if the tunnel is still refusing claims
if ! timeout 300 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((64,64))@jnp.ones((64,64)))[0,0]))" > /tmp/q_probe.log 2>&1; then
  echo "TUNNEL STILL DOWN $(date +%H:%M:%S)" | tee -a /tmp/q_master.log
  exit 1
fi
echo "TUNNEL UP $(date +%H:%M:%S)" | tee -a /tmp/q_master.log
sleep 95

# 1. fused-kernel double-buffer A/B (old vs new, one process)
Q kernel_ab 2400 python tools/ab/kernel_ab_dbuf.py
# 2. STT ring-vs-scatter A/B
Q stt_ab 2400 python tools/ab/stt_ring_ab.py
# 3. LLM dispatch-depth A/B (K=8 vs 16, B=16, 7B int8)
Q llm_ab 3000 python tools/ab/llm_k_ab.py
# 4. warm the compile cache for the flagship config (new kernel shapes)
INFERNOS_TTS_SLOTS=24 INFERNOS_STT_MAX_NEW=24 \
  Q warm 4000 python tools/warm_cache.py examples/live_translator.yaml
# 5. flagship: ramped full-pipeline LT calls
INFERNOS_TTS_SLOTS=24 INFERNOS_STT_MAX_NEW=24 \
  Q ltramp 5400 python -m infernos_tpu.bench.ltbench --ramp --full --turns 2 --sla 3.5
# 6. TTS paced-calls headline
Q ttsmain 3600 python -m infernos_tpu.bench.ttsmain
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a /tmp/q_master.log

# 7. retrain tiny STT/TTS on the bilingual (en+pt lexicon) corpus so the
#    LT pt leg transcribes/renders real translated words (en-only ckpt
#    measured 0% word acc on pt vocab).  Train to SCRATCH dirs and gate
#    with check_bilingual BEFORE touching the committed checkpoints.
INFERNOS_TRAIN_OUT_STT=/tmp/bi_stt_hw \
  Q stt_train 10800 python tools/train_tiny_stt.py
INFERNOS_TRAIN_OUT_TTS=/tmp/bi_tts_hw \
  Q tts_train 9000 python tools/train_tiny_tts.py
if INFERNOS_TINY_DATA_TINY_STT=/tmp/bi_stt_hw \
   INFERNOS_TINY_DATA_TINY_TTS=/tmp/bi_tts_hw \
   Q bilingual 1800 python tools/check_bilingual.py; then
  cp -r /tmp/bi_stt_hw/* /root/repo/infernos_tpu/models/data/tiny_stt/
  cp -r /tmp/bi_tts_hw/* /root/repo/infernos_tpu/models/data/tiny_tts/
  echo "BILINGUAL CHECKPOINTS PROMOTED" | tee -a /tmp/q_master.log
else
  echo "BILINGUAL GATE FAILED -- committed checkpoints untouched" | tee -a /tmp/q_master.log
fi
Q loopback 1800 python -m infernos_tpu.bench.loopback --speakers 4 --prompts 2
