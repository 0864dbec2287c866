#!/bin/bash
# Round-4b ordered TPU queue (post fairness-fix + lang-conditioned STT).
# One claim at a time, 95 s cooldowns, logs /tmp/q4b_*.log.
set -u
cd /root/repo
Q() {  # Q <label> <timeout_s> <cmd...>
  local label=$1 t=$2; shift 2
  while ps aux | grep -Eq "[b]ench\.py|[_]_graft_entry__"; do sleep 120; done
  echo "=== $label start $(date +%H:%M:%S) ===" | tee -a /tmp/q4b_master.log
  timeout "$t" "$@" > "/tmp/q4b_${label}.log" 2>&1
  local rc=$?
  echo "=== $label rc=$rc $(date +%H:%M:%S) ===" | tee -a /tmp/q4b_master.log
  sleep 95
  return $rc
}

# 1. flagship: ramped full-pipeline LT calls with the engine-fairness fix
#    (the previous run wedged at 8 calls on lock starvation, PERF.md)
INFERNOS_TTS_SLOTS=24 INFERNOS_STT_MAX_NEW=24 \
  Q ltramp 7200 python -m infernos_tpu.bench.ltbench --ramp --full --turns 2 --sla 3.5

# 2. language-conditioned bilingual STT retrain (full schedule, scratch)
INFERNOS_TRAIN_OUT_STT=/tmp/bi_stt_hw2 \
  Q stt_train 10800 python tools/train_tiny_stt.py

# 3. gate BOTH sides >=80% before touching the committed checkpoints
if INFERNOS_TINY_DATA_TINY_STT=/tmp/bi_stt_hw2 \
   INFERNOS_TINY_DATA_TINY_TTS=/tmp/bi_tts_hw \
   Q bilingual 1800 python tools/check_bilingual.py; then
  cp -r /tmp/bi_stt_hw2/* /root/repo/infernos_tpu/models/data/tiny_stt/
  cp -r /tmp/bi_tts_hw/* /root/repo/infernos_tpu/models/data/tiny_tts/
  echo "BILINGUAL CHECKPOINTS PROMOTED" | tee -a /tmp/q4b_master.log
  # 4. fresh whole-bank loopback QA on the PROMOTED pair
  Q loopback 2400 python -m infernos_tpu.bench.loopback --speakers 32 --prompts 8 \
    --checkpoint /tmp/loopback_bank2.json
  # 5. tiny-real e2e LT (both language directions, measured turns)
  Q lttiny 2400 python -m infernos_tpu.bench.ltbench --tiny-real --calls 2 --turns 2
else
  echo "BILINGUAL GATE FAILED -- committed checkpoints untouched" | tee -a /tmp/q4b_master.log
fi
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a /tmp/q4b_master.log
