"""Notification semantics (SURVEY S7/C5/C7) — pure driver-side, no Spark."""

from __future__ import annotations

from fileverification_spark import notify as N


def _cap():
    sent = []

    def transport(n, payload):
        sent.append((n.url, payload))
        return 200

    return sent, transport


def test_template_substitution_case_insensitive():
    n = N.Notification(
        url="http://x", body='{"text": "[MeSsAgE]"}', mime_type="application/json"
    )
    assert n.render("hello") == '{"text": "hello"}'


def test_json_escaping():
    # C5: the reference escapes \ " and control chars (Notification.cs:213-269)
    n = N.Notification(url="http://x", body='{"m": "[message]"}')
    out = n.render('a"b\\c\nd\te\x01f')
    assert out == '{"m": "a\\"b\\\\c\\nd\\te\\u0001f"}'
    import json

    assert json.loads(out)["m"] == 'a"b\\c\nd\te\x01f'


def test_plaintext_no_escaping():
    n = N.Notification(url="http://x", body="log: [message]", mime_type="text/plain")
    assert n.render('a"b\n') == 'log: a"b\n'


def test_min_resend_interval():
    sent, transport = _cap()
    n = N.Notification(url="http://x", body="[message]")
    clock = {"t": 1000.0}
    res1 = N.send([n], "one", transport=transport, now=lambda: clock["t"])
    clock["t"] += 5
    res2 = N.send([n], "two", transport=transport, now=lambda: clock["t"])
    clock["t"] += N.MIN_RESEND_SECONDS
    res3 = N.send([n], "three", transport=transport, now=lambda: clock["t"])
    assert res1[0][1] is None
    assert res2[0][1] == "skipped: min resend interval"
    assert res3[0][1] is None
    assert [p for _, p in sent] == ["one", "three"]


def test_transport_failure_not_fatal():
    def bad(n, payload):
        raise OSError("connection refused")

    n = N.Notification(url="http://down", body="[message]")
    (nn, err), = N.send([n], "msg", transport=bad)
    assert "connection refused" in err


# ---- timer re-send loop (Notifications.cs:47-52, 96-148) ----


def test_queue_accumulates_and_flushes_immediately():
    sent, transport = _cap()
    n = N.Notification(url="http://x", body="[message]",
                       mime_type="text/plain")
    q = N.NotificationQueue([n], transport=transport)
    q.queue("alpha")
    q.queue("beta")
    # immediate flush per queue() call, QueueRequest appends "\n"
    assert [p for _, p in sent] == ["alpha\n", "beta\n"]
    assert not q.has_message(n)


def test_timer_tick_ships_accumulated_batch():
    sent, transport = _cap()
    n = N.Notification(url="http://x", body="[message]",
                       mime_type="text/plain")
    q = N.NotificationQueue([n], transport=transport)
    q.queue("one", flush_now=False)
    q.queue("two", flush_now=False)
    assert q.has_message(n) and not sent
    res = q.tick()  # OnElapsed
    assert res == [(n, None)]
    assert sent == [("http://x", "one\ntwo\n")]
    assert q.tick() == []  # empty buffer → nothing shipped


def test_tick_enforces_min_wait_floor():
    logs = []
    q = N.NotificationQueue(
        [N.Notification(url="http://x", body="[message]")],
        wait_ms=1000, transport=lambda n, p: 200, log=logs.append)
    q.tick()
    assert q.wait_ms == N.MIN_WAIT_MS
    assert any("below the minimum" in s for s in logs)


def test_tick_stops_timer_with_no_endpoints():
    q = N.NotificationQueue([], transport=lambda n, p: 200)
    assert q.tick() == []
    assert q._stop.is_set()  # Notifications.cs:99-102


def test_failed_transport_requeues_for_next_tick():
    calls = {"n": 0}
    sent = []

    def flaky(n, payload):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("down")
        sent.append(payload)
        return 200

    n = N.Notification(url="http://x", body="[message]",
                       mime_type="text/plain")
    q = N.NotificationQueue([n], transport=flaky)
    q.queue("msg", flush_now=False)
    (nn, err), = q.tick()
    assert "down" in err and q.has_message(n)
    (nn, err2), = q.tick()  # retried on the next elapse
    assert err2 is None and sent == ["msg\n"] and not q.has_message(n)


def test_start_stop_background_timer_flushes_on_dispose():
    sent, transport = _cap()
    n = N.Notification(url="http://x", body="[message]",
                       mime_type="text/plain")
    q = N.NotificationQueue([n], wait_ms=N.MIN_WAIT_MS,
                            transport=transport)
    with q:
        q.queue("tail", flush_now=False)
    # stop() flushed the buffered tail without waiting a full interval
    assert sent == [("http://x", "tail\n")]
    assert q._thread is None


def test_parse_notifications_xml():
    import xml.etree.ElementTree as ET

    xml = """
    <notifications>
      <waittime>45000</waittime>
      <notification>
        <url>http://hook/a</url>
        <method>PUT</method>
        <data>
          <headers>
            <header><name>X-Token</name><value>t0</value></header>
          </headers>
          <body>{"m": "[message]"}</body>
          <type>application/json</type>
        </data>
      </notification>
      <notification><url/></notification>
      <notification><url>http://hook/b</url></notification>
    </notifications>
    """
    notifs, wait_ms = N.parse_notifications_xml(ET.fromstring(xml))
    assert wait_ms == 45000
    assert [x.url for x in notifs] == ["http://hook/a", "http://hook/b"]
    a = notifs[0]
    assert (a.method, a.headers, a.mime_type) == (
        "PUT", {"X-Token": "t0"}, "application/json")
    assert a.body == '{"m": "[message]"}'
    b = notifs[1]
    assert (b.method, b.body, b.mime_type) == (
        "POST", "", "application/json")
