"""WARC source tests (sources/warc.py).

Hand-authored spec golden bytes (ISO 28500 record framing, written
out longhand and independent of warc_build), record-at-time gzip
members, HTTP payload splitting, malformed/hostile inputs, the
distributed import, and the WARC -> html_extract pipeline hop."""

import gzip

import pytest

from accelerator_spark.sources.warc import (
    WarcError, warc_build, warc_decode_file, warc_import,
    warc_iter_records)


def _golden_plain():
    """Two records written out longhand: a warcinfo and an HTTP
    response whose payload is a 5-byte body behind HTTP headers."""
    info = (b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            b"WARC-Record-ID: <urn:uuid:0>\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"Content-Length: 9\r\n"
            b"\r\n"
            b"info-body"
            b"\r\n\r\n")
    http = (b"HTTP/1.1 200 X\r\n"
            b"Content-Type: text/html\r\n"
            b"Content-Length: 5\r\n\r\n"
            b"hello")
    resp = (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:1>\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"WARC-Target-URI: http://x.example/a\r\n"
            b"Content-Length: %d\r\n"
            b"\r\n" % len(http)) + http + b"\r\n\r\n"
    return info + resp


def test_golden_spec_bytes_and_builder_agreement():
    golden = _golden_plain()
    rows = warc_decode_file(golden)
    assert len(rows) == 2
    idx, wtype, uri, date, rid, status, ctype, body, n = rows[0]
    assert (wtype, status, body) == ("warcinfo", None, b"info-body")
    idx, wtype, uri, date, rid, status, ctype, body, n = rows[1]
    assert wtype == "response"
    assert uri == "http://x.example/a"
    assert (status, ctype) == (200, "text/html")
    assert body == b"hello" and n == 5
    # builder reproduces the golden bytes for the same inputs
    built = warc_build([
        dict(warc_type="warcinfo", payload=b"info-body"),
        dict(warc_type="response", target_uri="http://x.example/a",
             payload=b"hello", http=(200, "text/html")),
    ])
    assert built == golden


def test_gzip_members_and_sniff():
    recs = [dict(warc_type="response", target_uri=f"http://x/{i}",
                 payload=f"body-{i}".encode(), http=(200, "text/html"))
            for i in range(5)]
    gz = warc_build(recs, gzip_members=True)
    assert gz[:2] == b"\x1f\x8b"
    rows = warc_decode_file(gz)
    assert [r[7] for r in rows] == [f"body-{i}".encode()
                                    for i in range(5)]
    # single-member whole-file gzip (non-record-at-time) also reads
    whole = gzip.compress(warc_build(recs))
    assert [r[7] for r in warc_decode_file(whole)] == \
        [r[7] for r in rows]


def test_malformed_and_hostile():
    good = warc_build([dict(warc_type="response", payload=b"x" * 10)])
    with pytest.raises(WarcError, match="version line"):
        warc_decode_file(b"HARC/1.0\r\n\r\n")
    with pytest.raises(WarcError, match="truncated WARC header"):
        warc_decode_file(good[:10])
    with pytest.raises(WarcError, match="overruns"):
        warc_decode_file(good[:-14])  # cut inside the payload
    with pytest.raises(WarcError, match="unsupported WARC version"):
        warc_decode_file(good.replace(b"WARC/1.0", b"WARC/2.0"))
    no_len = good.replace(b"Content-Length: 10\r\n", b"")
    with pytest.raises(WarcError, match="Content-Length"):
        warc_decode_file(no_len)
    bad_gz = b"\x1f\x8b" + b"\x00" * 30
    with pytest.raises(WarcError, match="gzip member"):
        warc_decode_file(bad_gz)
    # record budget bounds crafted many-record streams
    spam = warc_build([dict(warc_type="resource", payload=b"")] * 50)
    with pytest.raises(WarcError, match="budget"):
        list(warc_iter_records(spam, max_records=10))
    # HTTP payload without blank line passes through whole
    raw = warc_build([dict(warc_type="response",
                           payload=b"HTTP/1.1 200 X\r\nbroken")])
    assert warc_decode_file(raw)[0][7] == b"HTTP/1.1 200 X\r\nbroken"


def test_warc_import_distributed_and_html_hop(spark, tmp_path):
    """Directory of .warc.gz -> rows -> html_extract: the CommonCrawl
    pipeline front."""
    from pyspark.sql import functions as F

    from accelerator_spark.operators.html import html_extract

    d = tmp_path / "crawl"
    d.mkdir()
    for f in range(2):
        recs = [dict(warc_type="warcinfo", payload=b"crawler")]
        for i in range(3):
            html = (f"<title>T{f}-{i}</title><p>body {f}-{i} "
                    f"<a href=x>l</a></p>").encode()
            recs.append(dict(warc_type="response",
                             target_uri=f"http://s{f}/p{i}",
                             payload=html, http=(200, "text/html")))
        (d / f"part-{f}.warc.gz").write_bytes(
            warc_build(recs, gzip_members=True))
    df = warc_import(spark, str(d))
    assert df.count() == 8
    pages = (df.filter("warc_type = 'response' AND http_status = 200")
             .select("target_uri",
                     F.col("payload").cast("string").alias("text")))
    ex = html_extract(pages, html_col="text", id_col="target_uri")
    got = {r["doc_id"]: r for r in ex.collect()}
    assert len(got) == 6
    assert got["http://s1/p2"]["title"] == "T1-2"
    assert got["http://s0/p0"]["text"] == "body 0-0 l"
    assert got["http://s0/p0"]["n_links"] == 1
