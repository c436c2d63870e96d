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
