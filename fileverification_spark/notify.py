"""Notification sink (SURVEY S7, C5, C7) — driver-side, out of the data
plane, mirroring the reference's batched log-shipping semantics
(FileVerification/Configuration/Notifications.cs:96-202,
Notification.cs:135-211, Net/Request.cs:70-227):

- the payload is the report log fold (operators/verify.report_log);
- ``[message]`` template substitution is case-insensitive
  (Notification.cs:156, :198 — C7);
- JSON bodies are escaped with the standard library (C5 — the reference
  hand-rolls CleanMessage, Notification.cs:213-269; `json.dumps` covers
  the same escape set: backslash, quote, control chars, \\uXXXX);
- a minimum re-send interval gates repeat notifications
  (Notifications.cs:21-24 — 30 s floor);
- transport failures are logged, never fatal (Request.cs catches and
  logs — a verify run must not die because a webhook is down).

HTTP POST uses urllib (stdlib). In this sandbox there is no network;
``send`` takes an injectable ``transport`` so tests (and offline runs)
capture payloads instead of POSTing.
"""

from __future__ import annotations

import json
import re
import time
import urllib.request
from dataclasses import dataclass, field

MIN_RESEND_SECONDS = 30  # Notifications.cs:21-24
MESSAGE_TOKEN = "[message]"


@dataclass
class Notification:
    url: str
    method: str = "POST"
    headers: dict[str, str] = field(default_factory=dict)
    body: str = ""  # may contain [message] (any case)
    mime_type: str = "application/json"
    _last_sent: float = field(default=0.0, repr=False)

    def render(self, message: str) -> str:
        """C7: case-insensitive [message] substitution; C5: JSON-escape
        the message when the body is JSON."""
        if self.mime_type == "application/json":
            # json.dumps gives a quoted string; strip the quotes because
            # the token sits inside the template's own quoting
            message = json.dumps(message)[1:-1]
        return re.sub(re.escape(MESSAGE_TOKEN), lambda _: message,
                      self.body, flags=re.IGNORECASE)


def _http_transport(n: Notification, payload: str) -> int:
    req = urllib.request.Request(
        n.url,
        data=payload.encode("utf-8"),
        method=n.method,
        headers={"Content-Type": n.mime_type, **n.headers},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status


def send(
    notifications: list[Notification],
    message: str,
    transport=None,
    now=time.monotonic,
) -> list[tuple[Notification, str | None]]:
    """Ship ``message`` to every endpoint respecting the min re-send
    interval. Returns (notification, error-or-None) per endpoint —
    failures are reported, not raised (Request.cs error swallowing)."""
    transport = transport or _http_transport
    out: list[tuple[Notification, str | None]] = []
    for n in notifications:
        t = now()
        if n._last_sent and t - n._last_sent < MIN_RESEND_SECONDS:
            out.append((n, "skipped: min resend interval"))
            continue
        try:
            transport(n, n.render(message))
            n._last_sent = t
            out.append((n, None))
        except Exception as exc:  # noqa: BLE001 — never fatal by design
            out.append((n, f"{type(exc).__name__}: {exc}"))
    return out
