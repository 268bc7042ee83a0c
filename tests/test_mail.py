"""mbox / MIME email source tests (sources/mail.py).

Hand-authored RFC 2822/2047/mboxrd golden bytes, builder-vs-splitter
framing cross-check against stdlib mailbox semantics, MIME multipart
walks with base64/quoted-printable transfer decoding, charset
fallbacks, malformed inputs, the distributed import."""

import base64

import pytest

from accelerator_spark.sources.mail import (
    mbox_build, mbox_decode_file, mbox_import, mbox_split,
    parse_email)


def _msg_plain(body=b"hello\nworld"):
    return (b"Message-ID: <m1@x>\n"
            b"From: Alice <a@example.com>\n"
            b"To: b@example.com, c@example.com\n"
            b"Date: Thu, 01 Jan 2026 00:00:05 +0000\n"
            b"Subject: plain one\n"
            b"Content-Type: text/plain; charset=utf-8\n"
            b"\n" + body)


def test_mbox_split_golden():
    data = (b"From a@x Thu Jan  1 00:00:00 2026\n"
            b"Subject: one\n\nbody1\n"
            b"\n"                       # framing blank line
            b"From b@x Thu Jan  1 00:00:00 2026\n"
            b"Subject: two\n\n>From the start\n>>From deeper\nend\n")
    msgs = list(mbox_split(data))
    assert len(msgs) == 2
    assert msgs[0] == b"Subject: one\n\nbody1"
    # mboxrd unquoting strips exactly one '>'
    assert msgs[1] == b"Subject: two\n\nFrom the start\n>From deeper\nend"


def test_mbox_split_bare_message_and_garbage():
    assert list(mbox_split(_msg_plain()))[0].startswith(b"Message-ID")
    assert list(mbox_split(b"")) == []
    # leading junk before a later separator: tolerant, becomes msg 0
    msgs = list(mbox_split(b"junk\nFrom a@x y\nhdr: v\n\nb\n"))
    assert msgs == [b"junk", b"hdr: v\n\nb"]
    # and headerless junk still parses (every field None / empty)
    d = parse_email(b"junk")
    assert d["message_id"] is None and d["date_ts"] is None


def test_build_split_roundtrip():
    raws = [_msg_plain(b"From the top\n>From quoted\nend"),
            _msg_plain(b"simple")]
    data = mbox_build(raws)
    assert list(mbox_split(data)) == raws
    # stdlib mailbox agrees with our framing
    import mailbox
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".mbox", delete=False) as fh:
        fh.write(data)
        name = fh.name
    mb = mailbox.mbox(name)
    assert len(mb) == 2
    # stdlib mailbox splits the SAME two messages at the same offsets
    # but does no mboxrd unquoting (it stores payloads verbatim) and
    # keeps the framing blank line — assert its verbatim view, which
    # pins our quoting as exactly one added '>' per From-line
    assert mb[0].get_payload() == ">From the top\n>>From quoted\nend\n"
    assert mb[1].get_payload() == "simple\n"


def test_parse_email_headers_and_date():
    d = parse_email(_msg_plain())
    assert d["message_id"] == "<m1@x>"
    assert d["subject"] == "plain one"
    assert d["from_addr"] == "Alice <a@example.com>"
    assert d["to_addrs"] == "b@example.com, c@example.com"
    assert d["date_ts"] == 1767225605
    assert d["body_text"] == "hello\nworld"
    assert d["body_html"] is None
    assert (d["n_parts"], d["n_attachments"]) == (1, 0)


def test_rfc2047_subject_and_qp_body():
    qp = "caf=C3=A9 says =E2=84=96 one".encode()
    raw = (b"Subject: =?utf-8?b?" + base64.b64encode("Sü-test".encode())
           + b"?=\n"
           b"Date: bogus date\n"
           b"Content-Type: text/plain; charset=utf-8\n"
           b"Content-Transfer-Encoding: quoted-printable\n"
           b"\n" + qp)
    d = parse_email(raw)
    assert d["subject"] == "Sü-test"
    assert d["body_text"] == "café says № one"
    assert d["date_ts"] is None


def test_multipart_with_attachment():
    body_b64 = base64.b64encode("unicode ± body".encode()).decode()
    raw = ("Message-ID: <mp@x>\n"
           "MIME-Version: 1.0\n"
           "Content-Type: multipart/mixed; boundary=BB\n"
           "\n"
           "--BB\n"
           "Content-Type: text/plain; charset=utf-8\n"
           "Content-Transfer-Encoding: base64\n"
           "\n" + body_b64 + "\n"
           "--BB\n"
           "Content-Type: text/html; charset=utf-8\n"
           "\n<p>H</p>\n"
           "--BB\n"
           "Content-Type: application/octet-stream\n"
           "Content-Disposition: attachment; filename=a.bin\n"
           "Content-Transfer-Encoding: base64\n"
           "\n" + base64.b64encode(b"\x00\x01\x02\x03").decode() + "\n"
           "--BB--\n").encode()
    d = parse_email(raw)
    assert d["body_text"] == "unicode ± body"
    # the newline before a boundary belongs to the BOUNDARY (MIME)
    assert d["body_html"] == "<p>H</p>"
    assert d["n_parts"] == 3
    assert d["n_attachments"] == 1
    assert d["attachment_bytes"] == 4


def test_charset_fallback():
    # declared charset missing: utf-8 first, then latin-1 total
    raw = (b"Content-Type: text/plain\n\n" + "é".encode("latin-1"))
    assert parse_email(raw)["body_text"] == "é"
    raw2 = (b"Content-Type: text/plain; charset=nonsuch-8\n\n" + b"ok")
    assert parse_email(raw2)["body_text"] == "ok"


def test_chunked_decode_bounds():
    data = mbox_build([_msg_plain(b"m%d" % i) for i in range(25)])
    batches = list(mbox_decode_file("p", data, chunk_records=10))
    assert [len(b) for b in batches] == [10, 10, 5]
    flat = [r for b in batches for r in b]
    assert [r[1] for r in flat] == list(range(25))
    assert flat[7][7] == "m7"          # body_text column


def test_mbox_import(spark, tmp_path):
    (tmp_path / "a.mbox").write_bytes(mbox_build([_msg_plain(b"one")]))
    (tmp_path / "b.mbox").write_bytes(
        mbox_build([_msg_plain(b"two"), _msg_plain(b"three")]))
    df = mbox_import(spark, str(tmp_path))
    rows = sorted((r.path.rsplit("/", 1)[-1], r.msg_idx, r.body_text)
                  for r in df.collect())
    assert rows == [("a.mbox", 0, "one"), ("b.mbox", 0, "two"),
                    ("b.mbox", 1, "three")]


def test_crlf_mbox():
    """CRLF line endings (Windows-written archives): framing and
    un-quoting must work on \\r\\n lines too."""
    data = (b"From a@x Thu Jan  1 00:00:00 2026\r\n"
            b"Subject: one\r\n\r\nbody1\r\n"
            b"\r\n"
            b"From b@x Thu Jan  1 00:00:00 2026\r\n"
            b"Subject: two\r\n\r\n>From quoted\r\n")
    msgs = list(mbox_split(data))
    assert len(msgs) == 2
    assert msgs[0] == b"Subject: one\r\n\r\nbody1\r"
    assert msgs[1] == b"Subject: two\r\n\r\nFrom quoted\r"
    d = parse_email(msgs[1])
    assert d["subject"] == "two"
    assert d["body_text"].startswith("From quoted")
