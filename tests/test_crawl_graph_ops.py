"""r15 operator contracts: Gopher repetition report (zero-shuffle
sorted-run analysis), redirect-chain pointer doubling, and anchor-text
harvesting.  Value-level DuckDB parity is covered by
tools/check_correctness.py; these pin the semantics on hand-built
micro-corpora where the expected numbers are computed by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_join_stream_spark.operators import text
from nosql_join_stream_spark.operators import warc as warc_ops


# --- repetition_report ------------------------------------------------------

def _report(spark, rows, line_words=3):
    df = spark.createDataFrame(rows, "id long, text string")
    out = text.repetition_report(df, "text", "id",
                                 line_words=line_words)
    return {r["id"]: r.asDict() for r in out.collect()}


def test_repetition_clean_doc_is_all_zero(spark):
    # 6 distinct words, 3-word lines: no dup lines/grams anywhere
    r = _report(spark, [(1, "a b c d e f")])[1]
    assert r["n_words"] == 6 and r["n_lines"] == 2
    assert r["n_dup_lines"] == 0 and r["dup5_chars"] == 0
    assert r["dup_line_frac"] == 0.0 and r["is_repetitive"] is False
    # a singleton top 2-gram is vacuous repetition: cnt < 2 ⇒ 0 chars
    # (one occurrence would otherwise clear 20% of an 11-char doc)
    assert r["top2_chars"] == 0


def test_repetition_duplicate_lines_counted_per_occurrence(spark):
    # lines (3 words): "a b c" x2 + "x y z" → 2 of 3 occurrences dup
    r = _report(spark, [(1, "a b c a b c x y z")])[1]
    assert r["n_lines"] == 3
    assert r["n_dup_lines"] == 2          # both members of the group
    assert r["dup_line_chars"] == 10      # 2 * len("a b c")
    assert r["dup_line_frac"] == round(2 / 3, 6)
    # "b c a" window also repeats → dup5 path may fire for 5-grams of
    # the repeated region; check the flag via the line rule regardless
    assert r["is_repetitive"] is True     # 0.667 > 0.30


def test_repetition_top2gram_and_dup5(spark):
    # "q w" appears 4 times in 8 words; chars = 4 * 3 = 12 over base
    r = _report(spark, [(1, "q w q w q w q w")])[1]
    assert r["top2_chars"] >= 4 * 3
    assert r["is_repetitive"] is True
    # a 5-gram repeated: "a b c d e a b c d e" → "a b c d e" count 2
    r2 = _report(spark, [(2, "a b c d e a b c d e")])[2]
    assert r2["dup5_chars"] >= 2 * 9
    assert r2["is_repetitive"] is True


def test_repetition_single_word_doc_no_grams(spark):
    r = _report(spark, [(1, "hello")])[1]
    assert r["n_words"] == 1 and r["n_lines"] == 1
    assert r["top2_chars"] == 0 and r["dup5_chars"] == 0
    assert r["is_repetitive"] is False


def test_repetition_report_plan_has_no_exchange(spark):
    # the scale contract: the whole report is a scan-side projection
    df = spark.createDataFrame([(1, "a b c a b c")],
                               "id long, text string")
    plan = text.repetition_report(df, "text", "id") \
               ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- resolve_redirects ------------------------------------------------------

def _fetches(spark, rows):
    return spark.createDataFrame(
        rows, "url_id long, status int, next_id long")


def test_redirects_resolve_chain(spark):
    # 1 → 2 → 3 → 4 (200); 5 direct
    f = _fetches(spark, [(1, 301, 2), (2, 301, 3), (3, 302, 4),
                         (4, 200, 0), (5, 200, 0)])
    out = {r.url_id: (r.final_id, r.n_hops, r.done)
           for r in warc_ops.resolve_redirects(f).collect()}
    assert out[1] == (4, 3, True)
    assert out[2] == (4, 2, True)
    assert out[3] == (4, 1, True)
    assert out[4] == (4, 0, True)
    assert out[5] == (5, 0, True)


def test_redirects_doubling_budget_marks_unresolved(spark):
    # chain of 5 hops with doublings=1 (covers ≤2 hops): head is
    # partially resolved and flagged done=False, tail rows resolve
    rows = [(i, 301, i + 1) for i in range(1, 6)] + [(6, 200, 0)]
    f = _fetches(spark, rows)
    out = {r.url_id: (r.final_id, r.n_hops, r.done)
           for r in warc_ops.resolve_redirects(f, doublings=1).collect()}
    assert out[5] == (6, 1, True)         # ≤ 2^k - 1 hops ⇒ done
    assert out[4][:2] == (6, 2)           # pointer landed, but the
    assert out[4][2] is False             # row can't SEE it's terminal
    assert out[1][2] is False             # 5 hops ≫ budget
    # with the default budget (2^3 = 8) the same chain fully resolves
    full = {r.url_id: (r.final_id, r.n_hops, r.done)
            for r in warc_ops.resolve_redirects(f).collect()}
    assert full[1] == (6, 5, True)


def test_redirects_self_loop_terminal(spark):
    # a 200 row whose next_id is garbage is still terminal at itself
    f = _fetches(spark, [(7, 200, 99_999)])
    (r,) = warc_ops.resolve_redirects(f).collect()
    assert (r.final_id, r.n_hops, r.done) == (7, 0, True)


# --- anchor text ------------------------------------------------------------

def test_extract_links_keeps_anchor_text_per_occurrence(spark):
    html = ('<p><a href="/doc/1">alpha</a>'
            '<a href="/doc/1">alpha</a>'
            '<a href="/doc/2">beta &amp; gamma</a></p>')
    df = spark.createDataFrame([(9, html)], "doc_id long, html string")
    rows = text.extract_html_links(df, "html", "doc_id").collect()
    assert [(r.href, r.anchor) for r in rows] == [
        ("/doc/1", "alpha"), ("/doc/1", "alpha"),
        ("/doc/2", "beta & gamma")]


# --- robots.txt -------------------------------------------------------------

_ROBOTS = """\
# politeness policy
User-agent: alpha
User-agent: beta
Crawl-delay: 7
Disallow: /a/
Allow: /a/b/
Disallow:
Disallow: /*.zip$

User-agent: *
Disallow: /priv
Allow: /priv
Sitemap: https://h/x.xml
"""


def _rules(spark):
    df = spark.createDataFrame([("h", _ROBOTS)],
                               "host string, robots string")
    return warc_ops.parse_robots(df, "robots", "host")


def test_parse_robots_groups_and_noise(spark):
    rows = _rules(spark).collect()
    ad = [(r.agent, r.directive, r.pattern) for r in rows]
    # consecutive User-agent lines share one rule block; Crawl-delay
    # noise doesn't break accumulation; empty Disallow is dropped
    assert ("alpha", "disallow", "/a/") in ad
    assert ("beta", "disallow", "/a/") in ad
    assert ("alpha", "allow", "/a/b/") in ad
    assert ("beta", "disallow", "/*.zip$") in ad
    assert ("*", "disallow", "/priv") in ad
    assert ("", "sitemap", "https://h/x.xml") in ad
    assert not any(p == "" for (_, d, p) in ad if d != "sitemap")
    wild = {r.pattern: r.has_wildcard for r in rows}
    assert wild["/*.zip$"] is True and wild["/a/"] is False


def _verdicts(spark, agent, paths):
    urls = spark.createDataFrame([("h", p) for p in paths],
                                 "host string, path string")
    out = warc_ops.robots_filter(urls, _rules(spark), agent)
    return {r.path: (r.allowed, r.rule_pattern) for r in out.collect()}


def test_robots_filter_precedence(spark):
    v = _verdicts(spark, "ALPHA",          # agent match case-folds
                  ["/a/x", "/a/b/x", "/free", "/deep/f.zip", "/a"])
    assert v["/a/x"] == (False, "/a/")            # prefix disallow
    assert v["/a/b/x"] == (True, "/a/b/")         # longer allow wins
    assert v["/free"] == (True, None)             # no match ⇒ allowed
    assert v["/deep/f.zip"] == (False, "/*.zip$")  # wildcard + anchor
    assert v["/a"] == (True, None)                # /a does not hit /a/


def test_robots_filter_tie_allow_wins_and_fallback(spark):
    # '*' group: /priv appears as both allow and disallow at equal
    # length — RFC 9309 resolves the tie to allow
    v = _verdicts(spark, "stranger", ["/priv/x", "/other"])
    assert v["/priv/x"] == (True, "/priv")
    assert v["/other"] == (True, None)
    # a specific group EXCLUDES the '*' rules for that agent
    v2 = _verdicts(spark, "alpha", ["/priv/x"])
    assert v2["/priv/x"] == (True, None)


def test_robots_host_without_rules_allows_all(spark):
    urls = spark.createDataFrame([("nohost", "/a/x")],
                                 "host string, path string")
    out = warc_ops.robots_filter(urls, _rules(spark), "alpha")
    (r,) = out.collect()
    assert r.allowed is True and r.rule_pattern is None


# --- image dHash ------------------------------------------------------------

def _dhash_of(spark, arrs):
    import numpy as np
    import pandas as pd
    from nosql_join_stream_spark.operators import multimodal
    from nosql_join_stream_spark.operators import png_codec as pc

    rows = [(i, pc.encode_gray(np.asarray(a, dtype=np.uint8)),
             "image/png", a.shape[1], a.shape[0], 1)
            for i, a in enumerate(arrs)]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload", "media_type",
                                    "width", "height", "n_frames"]))
    out = multimodal.image_dhash(media)
    return {r.doc_id: (r.hash_hi, r.hash_lo) for r in out.collect()}


def test_image_dhash_gradient_extremes(spark):
    import numpy as np
    inc = np.tile(np.arange(18, dtype=np.uint8) * 10, (16, 1))
    dec = inc[:, ::-1].copy()
    flat = np.full((16, 18), 7, dtype=np.uint8)
    h = _dhash_of(spark, [inc, dec, flat])
    # strictly increasing columns ⇒ every right cell beats the left ⇒
    # all 64 bits set; decreasing / constant ⇒ none
    assert h[0] == (0xFFFFFFFF, 0xFFFFFFFF)
    assert h[1] == (0, 0)
    assert h[2] == (0, 0)


def test_image_dhash_noise_robust_vs_sha(spark):
    import numpy as np
    rng_free = (np.add.outer(np.arange(16) * 3,
                             np.arange(24) * 5) % 251).astype(np.uint8)
    noisy = rng_free.copy()
    noisy[::5, ::7] ^= 1                      # sub-quantization noise
    h = _dhash_of(spark, [rng_free, noisy])
    ham = bin(h[0][0] ^ h[1][0]).count("1") \
        + bin(h[0][1] ^ h[1][1]).count("1")
    assert ham <= 3        # perceptually identical ⇒ a few bits at most


def test_image_dhash_uniform_shift_invariant(spark):
    # the shot-boundary contract: adding a constant to every pixel
    # cancels in the cross-multiplied compare (S+kA on both sides)
    import numpy as np
    a = (np.add.outer(np.arange(12) * 7, np.arange(20) * 3)
         % 251).astype(np.uint8)
    b = (a + 4).astype(np.uint8)              # no wrap: max 250+4
    h = _dhash_of(spark, [a, b])
    assert h[0] == h[1]


# --- sitemaps ---------------------------------------------------------------

def test_parse_sitemaps_kinds_namespace_and_errors(spark):
    import pytest
    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    urlset = (f'<urlset {ns}><url><loc>https://h/a</loc>'
              '<lastmod>2026-01-02</lastmod>'
              '<priority>0.7</priority></url>'
              '<url><lastmod>2026-01-03</lastmod></url>'   # no loc: skip
              '<url><loc> https://h/b </loc></url></urlset>')
    index = ('<sitemapindex><sitemap><loc>https://h/s1.xml</loc>'
             '</sitemap></sitemapindex>')                  # bare tags
    df = spark.createDataFrame(
        [("h1", urlset), ("h2", index)], "host string, xml string")
    rows = sorted(
        ((r.host, r.seq, r.kind, r.url, r.lastmod, r.priority)
         for r in warc_ops.parse_sitemaps(df, "xml", "host")
                          .collect()))
    assert rows == [
        ("h1", 0, "url", "https://h/a", "2026-01-02", "0.7"),
        ("h1", 1, "url", "https://h/b", None, None),
        ("h2", 0, "sitemap", "https://h/s1.xml", None, None)]
    bad = spark.createDataFrame([("hx", "<urlset><url>")],
                                "host string, xml string")
    with pytest.raises(Exception, match="malformed sitemap"):
        warc_ops.parse_sitemaps(bad, "xml", "host").collect()
    wrong = spark.createDataFrame([("hy", "<rss></rss>")],
                                  "host string, xml string")
    with pytest.raises(Exception, match="unknown sitemap root"):
        warc_ops.parse_sitemaps(wrong, "xml", "host").collect()
