"""SIP user agents: inbound (UAS) and outbound (UAC) call legs.

Capability parity with the reference's UA layer:

- :class:`UAS` -- inbound INVITE with **lazy answer**: sends ``100 Trying``
  immediately, defers the UAS decision until the app calls ``accept()`` /
  ``reject()`` (``SIP/InfernUAS.py:102-117``, ``InfernLazyUAS``); SDP
  negotiation accepts G722+G711 with ptime (``:50,78-84``); re-INVITE swaps
  media params (``SIP/InfernUA.py:101-108``); failure events use
  488/500 semantics (``InfernUASFailure``).
- :class:`UAC` -- outbound INVITE with offer SDP, digest auth retry, event
  bridge to a paired UAS leg (``SIP/InfernUAC.py``).

Both legs expose ``on_disconnect`` and drive media through caller-provided
hooks, keeping signaling/media planes decoupled.
"""

from __future__ import annotations

import uuid as uuid_mod
from typing import Callable, Optional, Tuple

from ..utils.logging import get_logger
from .message import NameAddr, SipMessage, SipURI, gen_tag
from .sdp import DEFAULT_ACCEPT, SdpNegotiationError, build_sdp, extract_rtp_params
from .stack import SIPStack, digest_response

log = get_logger("sip.ua")


class SipSessInfo:
    """Call metadata exposed to apps (reference ``SIP/SipSessInfo.py``)."""

    def __init__(self, call_id: str, from_name: str, from_number: str):
        self.call_id = call_id
        self.from_name = from_name
        self.from_number = from_number


class UAS:
    """One inbound call leg (server side of the initial INVITE)."""

    def __init__(self, stack: SIPStack, invite: SipMessage, addr,
                 accept_codecs=DEFAULT_ACCEPT):
        self.id = uuid_mod.uuid4()
        self.stack = stack
        self.invite = invite
        self.addr = addr
        self.accept_codecs = accept_codecs
        self.local_tag = gen_tag()
        self.remote_tag = invite.from_na.tag or ""
        self.call_id = invite.call_id
        self.answered = False
        self.terminated = False
        self.on_disconnect: Optional[Callable[[], None]] = None
        self.on_reinvite: Optional[Callable[[object], Optional[Tuple[str, int]]]] = None
        self._remote_cseq = invite.cseq[0]
        # register dialog routes (with and without remote tag for ACK quirks)
        key = (self.call_id, self.local_tag, self.remote_tag)
        stack.dialogs[key] = self._in_dialog
        self._dialog_key = key
        # 100 Trying goes out immediately (reference InfernLazyUAS,
        # SIP/InfernUAS.py:102-103)
        stack.send_response(invite, addr, 100, "Trying")

    # -- metadata ------------------------------------------------------------
    def get_session_info(self) -> SipSessInfo:
        f = self.invite.from_na
        return SipSessInfo(self.call_id, f.display, f.uri.user)

    @property
    def offer_sdp(self) -> str:
        return self.invite.body.decode("utf-8", "replace")

    def negotiate(self):
        """Offer SDP -> RTPParams (raises SdpNegotiationError)."""
        return extract_rtp_params(self.offer_sdp, accept=self.accept_codecs)

    # -- app decisions ----------------------------------------------------------
    def ring(self) -> None:
        self.stack.send_response(self.invite, self.addr, 180, "Ringing",
                                 to_tag=self.local_tag)

    def accept(self, rtp_laddr: Tuple[str, int], codec, ptime: int = 20) -> None:
        body = build_sdp(rtp_laddr, codec, ptime).encode()
        self.stack.send_response(
            self.invite, self.addr, 200, "OK", to_tag=self.local_tag,
            body=body, extra={
                "contact": f"<sip:{self.stack.local_addr[0]}:{self.stack.local_addr[1]}>",
            })
        self.answered = True

    def reject(self, code: int = 488, reason: str = "Not Acceptable Here") -> None:
        self.stack.send_response(self.invite, self.addr, code, reason,
                                 to_tag=self.local_tag)
        self._teardown()

    # -- in-dialog handling --------------------------------------------------------
    def _in_dialog(self, msg: SipMessage, addr) -> None:
        if msg.method == "ACK":
            return
        if msg.method == "BYE":
            self.stack.send_response(msg, addr, 200, "OK")
            self._teardown(notify=True)
            return
        if msg.method == "INVITE":  # re-INVITE
            try:
                params = extract_rtp_params(msg.body.decode("utf-8", "replace"),
                                            accept=self.accept_codecs)
            except SdpNegotiationError:
                self.stack.send_response(msg, addr, 488, "Not Acceptable Here")
                return
            laddr = None
            if self.on_reinvite is not None:
                laddr = self.on_reinvite(params)
            if laddr is None:
                self.stack.send_response(msg, addr, 488, "Not Acceptable Here")
                return
            body = build_sdp(laddr, params.codec, params.out_ptime).encode()
            self.stack.send_response(msg, addr, 200, "OK", body=body)
            return
        if msg.method == "CANCEL":
            self.stack.send_response(msg, addr, 200, "OK")
            if not self.answered:
                self.stack.send_response(self.invite, self.addr, 487,
                                         "Request Terminated",
                                         to_tag=self.local_tag)
                self._teardown(notify=True)
            return
        self.stack.send_response(msg, addr, 501, "Not Implemented")

    async def bye(self) -> None:
        """Terminate from our side."""
        if self.terminated:
            return
        remote_na = self.invite.from_na
        local_na = self.invite.to_na.with_tag(self.local_tag)
        contact = self.invite.get("contact")
        ruri = NameAddr.parse(contact).uri if contact else remote_na.uri
        bye = self.stack.make_request("BYE", ruri, local_na, remote_na,
                                      call_id=self.call_id, cseq=1,
                                      contact=False)
        try:
            await self.stack.send_request(bye, self.addr, timeout=8.0)
        except TimeoutError:
            pass
        self._teardown()

    def _teardown(self, notify: bool = False) -> None:
        if self.terminated:
            return
        self.terminated = True
        self.stack.dialogs.pop(self._dialog_key, None)
        if notify and self.on_disconnect is not None:
            self.on_disconnect()


class UAC:
    """One outbound call leg (client side of the INVITE)."""

    def __init__(self, stack: SIPStack, accept_codecs=DEFAULT_ACCEPT):
        self.id = uuid_mod.uuid4()
        self.stack = stack
        self.accept_codecs = accept_codecs
        self.call_id: Optional[str] = None
        self.local_tag = gen_tag()
        self.remote_tag = ""
        self.invite: Optional[SipMessage] = None
        self.final: Optional[SipMessage] = None
        self.remote_addr = None
        self.terminated = False
        self.connected = False
        self.on_disconnect: Optional[Callable[[], None]] = None
        self._cseq = 1
        self._dialog_key = None

    async def invite_call(self, ruri: SipURI, cld: str, rtp_laddr: Tuple[str, int],
                          codec, addr: Tuple[str, int],
                          username: str = "", password: str = "",
                          cli: str = "infernos", ptime: int = 20):
        """Send INVITE; returns negotiated RTPParams from the answer."""
        from_na = NameAddr(SipURI(user=cli, host=self.stack.local_addr[0],
                                  port=self.stack.local_addr[1]))
        from_na = from_na.with_tag(self.local_tag)
        to_na = NameAddr(SipURI(user=cld, host=ruri.host, port=ruri.port))
        msg = self.stack.make_request("INVITE", ruri, from_na, to_na,
                                      cseq=self._cseq)
        msg.body = build_sdp(rtp_laddr, codec, ptime,
                             extra_codecs=tuple(self.accept_codecs)).encode()
        msg.set("content-type", "application/sdp")
        self.call_id = msg.call_id
        self.invite = msg
        self.remote_addr = addr
        final = await self.stack.send_request(msg, addr)
        if final.code in (401, 407) and username:
            # digest challenge: retry with credentials
            chal = final.get("www-authenticate") or final.get("proxy-authenticate")
            hdr = "authorization" if final.code == 401 else "proxy-authorization"
            self.stack.send_ack(msg, final, addr)  # ACK the failure
            self._cseq += 1
            msg2 = self.stack.make_request("INVITE", ruri, from_na, to_na,
                                           call_id=self.call_id, cseq=self._cseq)
            msg2.body = msg.body
            msg2.set("content-type", "application/sdp")
            msg2.set(hdr, digest_response(chal, "INVITE", str(ruri),
                                          username, password))
            self.invite = msg2
            final = await self.stack.send_request(msg2, addr)
        self.final = final
        if final.code != 200:
            if final.code >= 300:
                self.stack.send_ack(self.invite, final, addr)
                self.terminated = True
                raise CallFailed(final.code, final.reason or "")
        self.remote_tag = final.to_na.tag or ""
        self.stack.send_ack(self.invite, final, addr)
        self.connected = True
        key = (self.call_id, self.local_tag, self.remote_tag)
        self._dialog_key = key
        self.stack.dialogs[key] = self._in_dialog
        params = extract_rtp_params(final.body.decode("utf-8", "replace"),
                                    accept=self.accept_codecs)
        return params

    def _in_dialog(self, msg: SipMessage, addr) -> None:
        if msg.method == "BYE":
            self.stack.send_response(msg, addr, 200, "OK")
            self._teardown(notify=True)
            return
        if msg.method == "ACK":
            return
        self.stack.send_response(msg, addr, 501, "Not Implemented")

    async def bye(self) -> None:
        if self.terminated or not self.connected:
            self.terminated = True
            return
        from_na = self.final.from_na
        to_na = self.final.to_na
        contact = self.final.get("contact")
        ruri = NameAddr.parse(contact).uri if contact else to_na.uri
        self._cseq += 1
        bye = self.stack.make_request("BYE", ruri, from_na, to_na,
                                      call_id=self.call_id, cseq=self._cseq,
                                      contact=False)
        try:
            await self.stack.send_request(bye, self.remote_addr, timeout=8.0)
        except TimeoutError:
            pass
        self._teardown()

    def _teardown(self, notify: bool = False) -> None:
        if self.terminated:
            return
        self.terminated = True
        if self._dialog_key:
            self.stack.dialogs.pop(self._dialog_key, None)
        if notify and self.on_disconnect is not None:
            self.on_disconnect()


class CallFailed(Exception):
    def __init__(self, code: int, reason: str):
        super().__init__(f"{code} {reason}")
        self.code = code
        self.reason = reason
