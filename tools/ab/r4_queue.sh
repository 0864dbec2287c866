#!/bin/bash
# Round-4 ordered TPU queue: one claim at a time, 95 s cooldowns, logs to
# /tmp/q4_*.log.  Yields to any driver-run bench.py / __graft_entry__.
set -u
cd /root/repo
Q() {  # Q <label> <timeout_s> <cmd...>
  local label=$1 t=$2; shift 2
  while ps aux | grep -Eq "[b]ench\.py|[_]_graft_entry__"; do sleep 120; done
  echo "=== $label start $(date +%H:%M:%S) ===" | tee -a /tmp/q4_master.log
  timeout "$t" "$@" > "/tmp/q4_${label}.log" 2>&1
  local rc=$?
  echo "=== $label rc=$rc $(date +%H:%M:%S) ===" | tee -a /tmp/q4_master.log
  sleep 95
  return $rc
}

# 1. LLM decode: scan vs full-unroll at real 7B dims
Q llm_unroll 2400 python tools/ab/llm_roofline.py
# 2. STT: time-minor + int8-direct cross attention
Q stt_i8 2400 python tools/ab/stt_tm_ab.py --i8-only
# 3. warm the compile cache for the flagship config (time-minor shapes)
INFERNOS_TTS_SLOTS=24 INFERNOS_STT_MAX_NEW=24 \
  Q warm 4200 python tools/warm_cache.py examples/live_translator.yaml
# 4. flagship: ramped full-pipeline LT calls (the north-star)
INFERNOS_TTS_SLOTS=24 INFERNOS_STT_MAX_NEW=24 \
  Q ltramp 5400 python -m infernos_tpu.bench.ltbench --ramp --full --turns 2 --sla 3.5
# 5. bilingual retrains to SCRATCH dirs (full schedules)
INFERNOS_TRAIN_OUT_STT=/tmp/bi_stt_hw \
  Q stt_train 10800 python tools/train_tiny_stt.py
INFERNOS_TRAIN_OUT_TTS=/tmp/bi_tts_hw \
  Q tts_train 9000 python tools/train_tiny_tts.py
# 6. gate BOTH sides >=80% before touching the committed checkpoints
if INFERNOS_TINY_DATA_TINY_STT=/tmp/bi_stt_hw \
   INFERNOS_TINY_DATA_TINY_TTS=/tmp/bi_tts_hw \
   Q bilingual 1800 python tools/check_bilingual.py; then
  cp -r /tmp/bi_stt_hw/* /root/repo/infernos_tpu/models/data/tiny_stt/
  cp -r /tmp/bi_tts_hw/* /root/repo/infernos_tpu/models/data/tiny_tts/
  echo "BILINGUAL CHECKPOINTS PROMOTED" | tee -a /tmp/q4_master.log
else
  echo "BILINGUAL GATE FAILED -- committed checkpoints untouched" | tee -a /tmp/q4_master.log
fi
# 7. whole-bank loopback QA (resumable cells)
Q loopback 2400 python -m infernos_tpu.bench.loopback --speakers 32 --prompts 8 \
  --checkpoint /tmp/loopback_bank.json
# 8. TTS paced-calls headline (if the window is still open)
Q ttsmain 3600 python -m infernos_tpu.bench.ttsmain
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a /tmp/q4_master.log
