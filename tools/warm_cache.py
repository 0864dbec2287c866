"""AOT compile-cache priming for a named config (VERDICT r2 item 10).

A production daemon restart at a new configuration pays the full XLA
compile wall (BENCH_r02: 723 s first-steps at a changed slot count).  This
tool performs a dry start of exactly the engines the config will serve --
same presets, same engine configs, same warmup shapes as the real actors --
so every executable lands in the persistent cache (``.jax_cache``) and the
real start replays them in seconds.

Run on the serving host (or any host sharing the cache volume):

    python tools/warm_cache.py examples/live_translator.yaml
    python tools/warm_cache.py --tiny config.yaml   # tiny dims (tests)

Engines warm sequentially and are freed between actors so peak HBM stays
a single engine's footprint.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _warm_actor(cls, label: str, tiny: bool, *start_args) -> float:
    """Instantiate + start (compiles all programs) + stop one model actor."""
    t0 = time.time()
    actor = cls(tiny=tiny)
    actor.start(*start_args)
    dt = time.time() - t0
    try:
        actor.on_stop()
    except Exception:
        pass
    del actor
    gc.collect()
    print(f"  warmed {label} in {dt:.1f}s", flush=True)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model dims (CI/tests)")
    a = ap.parse_args()

    from infernos_tpu.utils.compile_cache import enable as enable_cache

    cache_dir = enable_cache()
    print(f"compile cache: {cache_dir}")

    from infernos_tpu.cluster.model_actors import (LLMActor, STTActor,
                                                   TTSActor)
    from infernos_tpu.config import InfernConfig
    from infernos_tpu.config.config import AIAProfileConf, LTProfileConf

    iconf = InfernConfig(a.config)
    tiny = a.tiny

    tts_langs: set = set()
    need_stt = False
    need_llm = False
    for prof in iconf.apps.values():
        if isinstance(prof, LTProfileConf):
            tts_langs.update(getattr(prof, "tts_langs", ()) or ("en",))
            need_stt = True
        elif isinstance(prof, AIAProfileConf):
            tts_langs.add(getattr(prof, "tts_lang", "en") or "en")
            need_stt = True
            need_llm = True
    if not tts_langs:
        tts_langs = {"en"}

    total = 0.0
    t_all = time.time()
    for lang in sorted(tts_langs):
        total += _warm_actor(TTSActor, f"tts[{lang}]", tiny, lang)
    if need_stt:
        total += _warm_actor(STTActor, "stt", tiny)
    if need_llm:
        total += _warm_actor(LLMActor, "llm", tiny)
    print(f"cache primed: {total:.1f}s compile work captured "
          f"({time.time()-t_all:.1f}s wall); daemon restarts replay from "
          f"{cache_dir}")


if __name__ == "__main__":
    main()
