"""WARC (ISO 28500) record walk: framing, HTTP split, gzip members,
error contract, fuzz — the codec-discipline test file for the crawl
stage-zero parser."""

from __future__ import annotations

import pytest

from nosql_join_stream_spark.operators import warc as W


def _pair(url="https://example.org/doc/7", html="<p>hi</p>"):
    return W.build_warc_request(url) + W.build_warc_response(url, html)


def test_roundtrip_plain_and_gzip():
    raw = _pair()
    for payload in (raw, W.gzip_bytes(raw)):
        recs = W.parse_warc(payload)
        assert [r["type"] for r in recs] == ["request", "response"]
        st, hdrs, body = W.split_http_response(recs[1]["block"])
        assert st == 200
        assert hdrs["content-type"].startswith("text/html")
        assert body == b"<p>hi</p>"
        assert recs[0]["url"] == recs[1]["url"]


def test_multi_member_gzip():
    """Common Crawl gzips each record as its OWN member; members
    concatenate.  zlib unused_data looping must walk them all."""
    a = W.gzip_bytes(W.build_warc_request("https://example.org/a"))
    b = W.gzip_bytes(W.build_warc_response("https://example.org/a",
                                           "<p>x</p>"))
    recs = W.parse_warc(a + b)
    assert [r["type"] for r in recs] == ["request", "response"]


def test_truncated_gzip_member_is_loud():
    """A gzip member cut mid-stream decompresses without a zlib error
    (eof never reached) — the parser must still refuse it rather than
    return a silently shortened record list."""
    gz = W.gzip_bytes(_pair())
    with pytest.raises(ValueError, match="truncated gzip member"):
        W.parse_warc(gz[:len(gz) // 2])


def test_record_id_is_process_stable():
    """Default WARC-Record-ID derives from a content hash, not
    Python's salted hash() — fixture bytes are run-stable."""
    rec = W.build_warc_response("https://example.org/a", "<p>x</p>")
    assert b"WARC-Record-ID: <urn:uuid:" in rec
    import hashlib
    want = hashlib.sha256(b"https://example.org/a").hexdigest()[:12]
    assert want.encode() in rec


def test_unicode_body_content_length_octets():
    """Content-Length counts OCTETS, not characters — a multi-byte
    body must frame correctly."""
    html = "<p>café • ©</p>"
    recs = W.parse_warc(W.build_warc_response("u", html))
    _, _, body = W.split_http_response(recs[0]["block"])
    assert body.decode("utf-8") == html


def test_error_contract():
    raw = _pair()
    with pytest.raises(ValueError, match="version line"):
        W.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="truncated WARC record"):
        W.parse_warc(raw[:-10])
    with pytest.raises(ValueError, match="terminator"):
        W.parse_warc(raw[:-2])
    with pytest.raises(ValueError, match="Content-Length"):
        W.parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="trailing garbage"):
        W.parse_warc(W.gzip_bytes(raw) + b"junk")
    with pytest.raises(ValueError, match="status line"):
        W.split_http_response(b"NOPE\r\n\r\nbody")
    with pytest.raises(ValueError, match="header terminator"):
        W.split_http_response(b"HTTP/1.1 200 OK\r\nno-end")


def test_fuzz_never_crashes_unstructured():
    import random

    rng = random.Random(7)
    for _ in range(300):
        n = rng.randrange(0, 150)
        payload = (rng.choice([b"WARC/1.0\r\n", b"\x1f\x8b", b""])
                   + bytes(rng.randrange(256) for _ in range(n)))
        try:
            W.parse_warc(payload)
        except ValueError:
            pass  # the single documented error contract


_CANON_CASES = [
    # (raw, canonical) — each exercises a distinct rule; the DuckDB
    # oracle mirror (_URL_CANON_SQL_TAIL) is checked against the same
    # list below so the two rule sets cannot drift apart silently.
    ("https://example.org/doc/5?a=1&b=2",
     "https://example.org/doc/5?a=1&b=2"),
    ("HTTPS://WWW.Example.ORG:443/doc/5/?b=2&a=1#ref",
     "https://example.org/doc/5?a=1&b=2"),
    ("https://example.org/doc/5/?b=2&a=1",
     "https://example.org/doc/5?a=1&b=2"),
    ("http://example.org:8080/alt/5//",
     "http://example.org:8080/alt/5"),
    ("http://www.site.com:80/", "http://site.com/"),
    ("https://site.com", "https://site.com/"),
    ("https://site.com?z=9&a=1&", "https://site.com/?a=1&z=9"),
    ("  https://x.org/p#f1#f2  ", "https://x.org/p"),
    ("ftp://weird.org/x/", "ftp://weird.org/x/"),   # pass-through
    ("not a url", "not a url"),                      # pass-through
]


def test_canonicalize_url_rules(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(i, r) for i, (r, _) in enumerate(_CANON_CASES)],
        "i int, url string")
    got = {r.i: r.c for r in
           df.select("i", W.canonicalize_url(F.col("url")).alias("c"))
             .collect()}
    for i, (_raw, want) in enumerate(_CANON_CASES):
        assert got[i] == want


def test_canonicalize_url_duckdb_mirror_agrees():
    """The oracle's SQL canonicalization must produce the same
    canonical form as the Spark column for every rule case (the
    http/https ones — pass-throughs never reach the oracle CTE).
    The tail GROUPs BY canonical url, so compare grouped shapes:
    expected group -> (min case id, fetch count)."""
    import duckdb

    import nosql_join_stream_spark.queries  # noqa: F401  registry init order
    from nosql_join_stream_spark.queries_pipeline import \
        _URL_CANON_SQL_TAIL

    cases = [(i, r, want) for i, (r, want) in enumerate(_CANON_CASES)
             if r.strip().lower().startswith("http")]
    vals = ", ".join(f"({i}, {i}, '{raw}')" for i, raw, _ in cases)
    sql = (f"WITH v(doc_id, seq, url) AS (VALUES {vals}),"
           + _URL_CANON_SQL_TAIL)
    expected = {}
    for i, _raw, want in cases:
        lo, n = expected.get(want, (i, 0))
        expected[want] = (min(lo, i), n + 1)
    got = {r[1]: (r[0], r[2]) for r in duckdb.sql(sql).fetchall()}
    assert got == expected
