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
import threading
import time
import urllib.request
from dataclasses import dataclass, field

MIN_RESEND_SECONDS = 30  # Notifications.cs:21-24
DEFAULT_WAIT_MS = 60_000  # Notifications.cs:21 DEFAULT_WAIT_TIME
MIN_WAIT_MS = 30_000      # Notifications.cs:24 MIN_WAIT_TIME
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


class NotificationQueue:
    """The reference's accumulate-then-timer-flush loop
    (Notifications.cs:47-52, :96-148, Notification.cs:124-132):

    - :meth:`queue` appends the message (plus ``\\n``, QueueRequest
      semantics — Notification.cs:126) to every endpoint's buffer and,
      like ``Notifications.Send`` (Notifications.cs:159-180), flushes
      immediately;
    - a background timer re-fires every ``wait_ms`` (floor 30 000 ms,
      re-checked at tick like OnElapsed — Notifications.cs:103-107) and
      re-ships anything still buffered, e.g. messages queued with
      ``flush_now=False`` or re-queued after a transport failure;
    - the buffer is cleared when the payload is *rendered*, before the
      transport runs (Notification.cs:156-167 clears post-render) — but
      unlike the reference, a failed transport re-queues the rendered-
      from buffer so the next tick retries instead of dropping logs
      (documented divergence: the reference loses the batch on HTTP
      error);
    - with no endpoints the timer stops (Notifications.cs:99-102).

    Driver-side only — never touches the data plane. ``start()`` spins a
    daemon thread; tests drive :meth:`tick` directly."""

    def __init__(
        self,
        notifications: list[Notification],
        wait_ms: int = DEFAULT_WAIT_MS,
        transport=None,
        log=None,
    ) -> None:
        self.notifications = list(notifications)
        self.wait_ms = wait_ms
        self._transport = transport or _http_transport
        self._log = log or (lambda s: None)
        self._buffers: dict[int, list[str]] = {
            id(n): [] for n in self.notifications}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def queue(self, message: str, flush_now: bool = True) -> None:
        with self._lock:
            for n in self.notifications:
                self._buffers[id(n)].append(message + "\n")
        if flush_now:
            self.tick()

    def has_message(self, n: Notification) -> bool:
        return bool(self._buffers[id(n)])

    def tick(self) -> list[tuple[Notification, str | None]]:
        """One timer elapse: enforce the wait-time floor, ship every
        non-empty buffer, clear at render, re-queue on failure."""
        if not self.notifications:
            self._stop.set()  # Notifications.cs:99-102 — timer stops
            return []
        if self.wait_ms < MIN_WAIT_MS:
            self._log(
                f"The wait time {self.wait_ms} is below the minimum of "
                f"{MIN_WAIT_MS}. Setting wait time to {MIN_WAIT_MS}.")
            self.wait_ms = MIN_WAIT_MS
        out: list[tuple[Notification, str | None]] = []
        for n in self.notifications:
            with self._lock:
                buf = self._buffers[id(n)]
                if not buf:
                    continue
                accumulated = "".join(buf)
                buf.clear()  # cleared at render (Notification.cs:167)
            try:
                self._transport(n, n.render(accumulated))
                out.append((n, None))
            except Exception as exc:  # noqa: BLE001 — never fatal
                with self._lock:
                    # retry next tick rather than drop (divergence, doc'd)
                    self._buffers[id(n)].insert(0, accumulated)
                out.append((n, f"{type(exc).__name__}: {exc}"))
                self._log(f"notification to {n.url} failed: {exc}")
        return out

    def start(self) -> "NotificationQueue":
        def run() -> None:
            while not self._stop.wait(self.wait_ms / 1000.0):
                self.tick()

        self._thread = threading.Thread(
            target=run, name="fv-notify-timer", daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        """Dispose (Notifications.cs:55-84): stop the timer and flush
        whatever is still buffered so shutdown never drops logs."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        self.tick()

    def __enter__(self) -> "NotificationQueue":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def parse_notifications_xml(elem) -> tuple[list[Notification], int]:
    """Parse a ``<notifications>`` element (reference XML schema —
    Notifications.cs:30-42, Notification.cs:23-89, Data.cs:22-35,
    Headers.cs:14-15, Header.cs:12-16) into Notification objects plus
    the wait time in ms."""
    wait_el = elem.find("waittime")
    wait_ms = (int((wait_el.text or "").strip())
               if wait_el is not None and (wait_el.text or "").strip()
               else DEFAULT_WAIT_MS)
    out: list[Notification] = []
    for n_el in elem.findall("notification"):
        url = (n_el.findtext("url") or "").strip()
        if not url:
            continue  # reference skips url-less entries (Request.cs:84)
        headers = {
            (h.findtext("name") or "").strip(): (h.findtext("value")
                                                 or "").strip()
            for h in n_el.findall("data/headers/header")
            if (h.findtext("name") or "").strip()
        }
        out.append(Notification(
            url=url,
            method=(n_el.findtext("method") or "POST").strip() or "POST",
            headers=headers,
            body=n_el.findtext("data/body") or "",
            mime_type=(n_el.findtext("data/type")
                       or "application/json").strip(),
        ))
    return out, wait_ms
