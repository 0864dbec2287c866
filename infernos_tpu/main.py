"""CLI daemon entry point.

Capability parity with ``Infernos.py:28-92``: ``python -m infernos_tpu
[-f] [-L logfile] [-i pidfile] config.yaml`` -- parse flags, daemonize
unless foreground, build the validated config, spawn the actor graph
(RTP -> apps -> SIP), and block for the process lifetime.
"""

from __future__ import annotations

import getopt
import os
import signal
import sys
import threading
from typing import Dict, List, Optional

from .cluster.actors import ActorHandle, spawn, stop_all
from .cluster.rtp_actor import RTPActor
from .config import InfernConfig
from .config.config import AIAProfileConf, LTProfileConf
from .utils.logging import get_logger
from .utils.platform import model_start_timeout

log = get_logger("main")


def build_cluster(iconf: InfernConfig, tiny: bool = False,
                  bind_ip: Optional[str] = None,
                  stt_actr: Optional[ActorHandle] = None,
                  start_kwargs: Optional[dict] = None) -> Dict[str, ActorHandle]:
    """Spawn and wire the full actor graph from a validated config.

    ``stt_actr``: pre-existing STT actor handle -- typically a
    ``cluster.remote.RemoteActorHandle`` placing the STT leg on another
    host (the reference's Ray cross-host placement, SURVEY.md section 2.9).
    """
    from .apps.ai_attendant import AIAActor
    from .apps.live_translator import LTActor
    from .sip.agent import SIPAgent

    handles: Dict[str, ActorHandle] = {}
    rtp_actr = spawn(
        RTPActor,
        min_port=iconf.rtp_conf.min_port,
        max_port=iconf.rtp_conf.max_port,
        bind_ip=bind_ip or iconf.sip_conf.bind[0],
        name="rtp",
    )
    handles["rtp"] = rtp_actr

    app_actors: Dict[str, ActorHandle] = {}
    for key, prof in iconf.apps.items():
        if isinstance(prof, LTProfileConf):
            h = spawn(LTActor, prof, tiny=tiny, name=key)
        elif isinstance(prof, AIAProfileConf):
            h = spawn(AIAActor, prof, tiny=tiny, name=key)
        else:
            continue
        app_actors[key] = h
        handles[key] = h

    sip_actr = spawn(SIPAgent, iconf, rtp_actr, app_actors, name="sip",
                     max_concurrency=2)
    handles["sip"] = sip_actr
    # fail fast if the signaling plane could not bind (a half-up daemon that
    # loads models but serves no calls is worse than a crash)
    sip_actr.ask_sync("ready_check", timeout=30)
    for key, h in app_actors.items():
        prof = iconf.apps[key]
        # the app start is a SEQUENCE of model-actor starts, each entitled
        # to the full per-model budget on a cold compile cache: LT spawns
        # one TTS per language + STT; AIA spawns TTS + STT + LLM
        if isinstance(prof, LTProfileConf):
            n_models = len(getattr(prof, "tts_langs", None) or ("en",)) + 1
        else:
            n_models = 3
        h.ask_sync("start", h, sip_actr, rtp_actr, stt_actr=stt_actr,
                   **(start_kwargs or {}),
                   timeout=(n_models + 1) * model_start_timeout())
    return handles


def main(argv: List[str]) -> int:
    foreground = False
    logfile: Optional[str] = None
    pidfile: Optional[str] = None
    tiny = bool(os.environ.get("INFERNOS_TINY"))
    try:
        opts, args = getopt.getopt(argv[1:], "fL:i:t")
    except getopt.GetoptError as e:
        print(f"usage: {argv[0]} [-f] [-L logfile] [-i pidfile] config.yaml",
              file=sys.stderr)
        return 2
    for o, a in opts:
        if o == "-f":
            foreground = True
        elif o == "-L":
            logfile = a
        elif o == "-i":
            pidfile = a
        elif o == "-t":
            tiny = True
    if len(args) != 1:
        print(f"usage: {argv[0]} [-f] [-L logfile] [-i pidfile] config.yaml",
              file=sys.stderr)
        return 2

    if not foreground:
        # daemonize (reference uses sippy.misc.daemonize, Infernos.py:57-58)
        if os.fork() > 0:
            return 0
        os.setsid()
        if os.fork() > 0:
            os._exit(0)
        sink = open(logfile, "a") if logfile else open(os.devnull, "w")
        os.dup2(sink.fileno(), 1)
        os.dup2(sink.fileno(), 2)
    if pidfile:
        with open(pidfile, "w") as f:
            f.write(str(os.getpid()))

    from .utils.compile_cache import enable as enable_compile_cache
    from .utils.platform import ensure_backend_or_degrade

    cache_dir = enable_compile_cache()  # warm daemon restarts skip recompiles
    # bounded probe first: a dead remote-device service hangs jax.devices()
    # forever; degraded-on-CPU beats a daemon that never finishes booting
    platform = ensure_backend_or_degrade()
    log.info("compute platform: %s (compile cache %s)", platform, cache_dir)
    iconf = InfernConfig(args[0])
    build_cluster(iconf, tiny=tiny)
    log.info("infernos_tpu up; SIP on %s:%d", *iconf.sip_conf.bind)

    # operator surface: /metrics endpoint (config `metrics: {port: N}` or
    # INFERNOS_METRICS_PORT) + SIGUSR1 snapshot dump (always on)
    from .utils.metrics_export import MetricsServer, install_sigusr1_dump

    install_sigusr1_dump()
    msrv = None
    mport = iconf.metrics_port or int(
        os.environ.get("INFERNOS_METRICS_PORT", 0) or 0)
    if mport:
        msrv = MetricsServer(port=mport, host=iconf.metrics_bind).start()

    stopper = threading.Event()
    signal.signal(signal.SIGTERM, lambda *a: stopper.set())
    signal.signal(signal.SIGINT, lambda *a: stopper.set())
    stopper.wait()
    log.info("shutting down")
    if msrv is not None:
        msrv.close()
    stop_all()
    return 0


def cli() -> None:
    """console_scripts entry point (pyproject [project.scripts])."""
    raise SystemExit(main(sys.argv))


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
