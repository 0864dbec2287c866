"""Smoke tests for the call-level benches (BASELINE.md configs 4 and 5)."""

import textwrap

import pytest

from infernos_tpu.cluster.actors import stop_all
from infernos_tpu.config import InfernConfig
from infernos_tpu.main import build_cluster


@pytest.mark.e2e
def test_lt_multi_call_bench(tmp_path):
    from infernos_tpu.bench.ltbench import MultiFarEnd, run_lt_bench

    far = MultiFarEnd(port=16090)
    cfg_text = textwrap.dedent("""
        sip:
          settings:
            bind: 127.0.0.1:16091
          profiles:
            inbound:
              sink: apps/live_translator/bench
            bob:
              sip_server: 127.0.0.1:16090
        rtp:
          settings:
            min_port: 32100
            max_port: 32600
        apps:
          live_translator:
            profiles:
              bench:
                stt_langs: ['en', 'pt']
                tts_langs: ['pt', 'en']
                outbound: sip/bob;cld=900
    """)
    p = tmp_path / "lt.yaml"
    p.write_text(cfg_text)
    iconf = InfernConfig(str(p))
    build_cluster(iconf, tiny=True, bind_ip="127.0.0.1")
    try:
        r = run_lt_bench(iconf.sip_conf.bind, far, n_calls=2, turns=1,
                         turn_timeout=60.0)
        assert r.answered == 2, r
        assert r.turns >= 1, r  # at least one measured translate turn
        assert r.turn_p50_s < 30.0, r
    finally:
        stop_all()
        far.close()


@pytest.mark.e2e
def test_aia_multi_call_bench(tmp_path):
    from infernos_tpu.bench.aiabench import run_aia_bench

    cfg_text = textwrap.dedent("""
        sip:
          settings:
            bind: 127.0.0.1:16092
          profiles:
            inbound:
              sink: apps/ai_attendant/bench
        rtp:
          settings:
            min_port: 32600
            max_port: 33100
        apps:
          ai_attendant:
            profiles:
              bench:
                stt_lang: en
                tts_lang: en
                llm_prompt: "You are a phone attendant. Be brief."
    """)
    p = tmp_path / "aia.yaml"
    p.write_text(cfg_text)
    iconf = InfernConfig(str(p))
    build_cluster(iconf, tiny=True, bind_ip="127.0.0.1")
    try:
        r = run_aia_bench(iconf.sip_conf.bind, n_calls=2, turns=1,
                          turn_timeout=90.0)
        assert r.answered == 2, r
        assert r.turns >= 1, r
        assert r.reply_p50_s < 60.0, r
    finally:
        stop_all()
