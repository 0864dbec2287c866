#!/bin/bash
# Round-4b ordered TPU queue (post fairness-fix + encode-pad).  One claim
# at a time, 95 s cooldowns, logs /tmp/q4b_*.log.  Yields to any
# driver-run bench.py / __graft_entry__.
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

# 1. language-conditioned bilingual STT retrain (commit 414d923 landed
#    AFTER the morning train ran; the 05:22 checkpoint has no <|lang_pt|>
#    and snaps en words to pt cognates -- 'help' -> 'meu')
INFERNOS_TRAIN_OUT_STT=/tmp/bi_stt_hw2 \
  Q stt_train 10800 python tools/train_tiny_stt.py

# 2. gate BOTH sides >=80% before touching the committed checkpoints
#    (TTS reuses the morning full-a-z retrain; it is lang-independent)
if INFERNOS_TINY_DATA_TINY_STT=/tmp/bi_stt_hw2 \
   INFERNOS_TINY_DATA_TINY_TTS=/tmp/bi_tts_hw \
   Q bilingual 1800 python tools/check_bilingual.py; then
  cp -r /tmp/bi_stt_hw2/* /root/repo/infernos_tpu/models/data/tiny_stt/
  cp -r /tmp/bi_tts_hw/* /root/repo/infernos_tpu/models/data/tiny_tts/
  echo "BILINGUAL CHECKPOINTS PROMOTED" | tee -a /tmp/q4b_master.log
else
  echo "BILINGUAL GATE FAILED -- committed checkpoints untouched" | tee -a /tmp/q4b_master.log
fi

# 3. re-warm the compile cache: encode_pad changed every STT encode graph
INFERNOS_TTS_SLOTS=24 INFERNOS_STT_MAX_NEW=24 \
  Q warm 4200 python tools/warm_cache.py examples/live_translator.yaml

# 4. flagship: ramped full-pipeline LT calls with the engine-fairness fix
#    (the previous run wedged at 8 calls on lock starvation, PERF.md)
INFERNOS_TTS_SLOTS=24 INFERNOS_STT_MAX_NEW=24 \
  Q ltramp 7200 python -m infernos_tpu.bench.ltbench --ramp --full --turns 2 --sla 3.5

# 5. LLM decode B-sweep at Tmax 1024 (B=32 @ 2048 OOMs; KV halves at 1024)
Q llm_bsweep 2400 python tools/ab/llm_roofline.py --b 16,24,32 --tmax 1024 --unroll 1

# 6. engine pipeline depth: max_inflight in {1,2,3} (host loop is the
#    limiter now that the device step hits 80% of roofline)
Q llm_inflight 2400 python tools/ab/llm_inflight_ab.py

# 7. whole-bank loopback QA on the PROMOTED bilingual pair
Q loopback 2400 python -m infernos_tpu.bench.loopback --speakers 32 --prompts 8 \
  --checkpoint /tmp/loopback_bank3.json

# 8. tiny-real e2e LT (both language directions, measured turns)
Q lttiny 2400 python -m infernos_tpu.bench.ltbench --tiny-real --calls 2 --turns 2
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a /tmp/q4b_master.log
