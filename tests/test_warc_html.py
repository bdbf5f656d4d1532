"""WARC walker + strict HTML extractor tests (operators/warc.py, r11):
stdlib html.parser cross-implementation equality (code the module never
touches), hand-built records and pages so a synth/walker-symmetric bug
cannot hide, loud rejection of malformed framing, and the map-only
distributed shape."""

from __future__ import annotations

import pytest

from python_multiproc_bigdata_spark.operators.warc import (
    _warc_record,
    expected_extraction,
    html_to_text,
    pack_warc_shards,
    synth_html,
    walk_warc_shards,
    warc_records,
)


def _stdlib_extract(html: str) -> str:
    """Independent extraction via stdlib html.parser (convert_charrefs
    decodes entities; script/style content skipped by tag depth)."""
    from html.parser import HTMLParser

    class P(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.buf: list[str] = []
            self.skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self.skip:
                self.skip -= 1

        def handle_data(self, data):
            if not self.skip:
                self.buf.append(data)

    p = P()
    p.feed(html)
    p.close()
    return " ".join("".join(p.buf).split())


def test_html_extract_matches_stdlib_on_synth_corpus():
    for d in range(60):
        html = synth_html(d, f"words for doc {d} here").decode()
        ours = html_to_text(html)
        assert ours == _stdlib_extract(html), (d, ours)
        assert ours == expected_extraction(d, f"words for doc {d} here")


def test_html_extract_hand_cases():
    # quoted '>' must not close the tag; entities decode; comments with
    # '--' runs and fake tags vanish; script body with fake tags vanishes
    cases = [
        ('<a href="x>y">A</a>', "A"),
        ("<p data-q='1>2'>B&amp;C</p>", "B&C"),
        ("x<!-- <p>no</p> -- -- -->y", "xy"),
        ("<script>var a = '<p>no</p>';</script>ok", "ok"),
        ("<style>a>b { x: 1 }</style>ok", "ok"),
        ("A&#66;&#x43;", "ABC"),
        ("a  \n\t b", "a b"),
        ("<br/>solo<img src='x'/>", "solo"),
        ("<SCRIPT>x</SCRIPT>after", "after"),
    ]
    for html, want in cases:
        assert html_to_text(html) == want, (html, html_to_text(html))
        assert html_to_text(html) == _stdlib_extract(html), html


def test_html_strict_rejections():
    with pytest.raises(ValueError, match="unterminated comment"):
        html_to_text("<!-- never closed")
    with pytest.raises(ValueError, match="unterminated tag"):
        html_to_text("<a href='x")
    with pytest.raises(ValueError, match="unknown named entity"):
        html_to_text("&bogus;")
    with pytest.raises(ValueError, match="unterminated character reference"):
        html_to_text("a & b")
    with pytest.raises(ValueError, match="unterminated raw-text"):
        html_to_text("<script>var x = 1;")
    with pytest.raises(ValueError, match="bare '<'"):
        html_to_text("1 < 2")


def test_warc_framing_and_rejections():
    rec = _warc_record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", "<urn:doc:5>"),
            ("WARC-Date", "2024-01-01T00:00:00Z"),
            ("WARC-Target-URI", "http://example.com/doc/5"),
        ],
        b"<p>hi</p>",
    )
    info = _warc_record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", "<urn:info:0>"),
            ("WARC-Date", "2024-01-01T00:00:00Z"),
        ],
        b"software: x\r\n",
    )
    recs = warc_records(info + rec)
    assert [h["WARC-Type"] for h, _ in recs] == ["warcinfo", "response"]
    assert recs[1][1] == b"<p>hi</p>"

    with pytest.raises(ValueError, match="unsupported WARC version"):
        warc_records(b"WARC/0.9\r\n\r\n")
    with pytest.raises(ValueError, match="missing required field"):
        warc_records(
            b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
        )
    # Content-Length lies long → truncation detected
    bad = bytearray(rec)
    idx = bad.index(b"Content-Length: ")
    bad[idx + 16 : idx + 17] = b"9" + bad[idx + 16 : idx + 17]
    with pytest.raises(ValueError, match="truncated"):
        warc_records(bytes(bad))
    # terminator clipped
    with pytest.raises(ValueError, match="terminator"):
        warc_records(rec[:-2])


def test_warc_roundtrip_distributed(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma"), (17, "delta  words")],
        ["doc_id", "text"],
    )
    out = walk_warc_shards(pack_warc_shards(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # pack groups by shard (one exchange); the walk adds none on top
    assert plan.count("Exchange") <= 1, plan
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {0, 1, 17}
    assert rows[17].shard_id == 1
    import hashlib

    want = expected_extraction(17, "delta  words")
    assert rows[17].text_md5 == hashlib.md5(want.encode()).hexdigest()
    assert rows[17].n_chars == len(want)
    assert rows[0].content_md5 == hashlib.md5(synth_html(0, "alpha beta")).hexdigest()


def test_gzip_multimember_split_and_rejections():
    """gzip_members must split RFC 1952 concatenated members (with and
    without optional FNAME fields), verify every member's CRC/ISIZE, and be
    cross-readable by stdlib gzip (which also concatenates members)."""
    import gzip as stdgzip

    import pytest as _pytest

    from python_multiproc_bigdata_spark.operators.archives import (
        gzip_members,
        gzip_wrap,
    )

    parts = [b"first record", b"", b"third " * 100]
    blob = (
        gzip_wrap(parts[0], fname=b"a.rec")
        + gzip_wrap(parts[1])
        + gzip_wrap(parts[2], fcomment=b"note")
    )
    assert gzip_members(blob) == parts
    # stdlib reads the same stream as the concatenation of all members
    assert stdgzip.decompress(blob) == b"".join(parts)
    # and our splitter reads stdlib-written members
    assert gzip_members(stdgzip.compress(b"x") + stdgzip.compress(b"y")) == [
        b"x",
        b"y",
    ]
    bad = bytearray(blob)
    bad[-6] ^= 0xFF  # corrupt the LAST member's ISIZE field
    with _pytest.raises(ValueError, match="ISIZE|CRC"):
        gzip_members(bytes(bad))
    with _pytest.raises(ValueError, match="not a gzip member"):
        gzip_members(blob + b"JUNK")


def test_warcgz_roundtrip_one_record_per_member(spark):
    import hashlib

    from python_multiproc_bigdata_spark.operators.archives import (
        gzip_members,
        gzip_wrap,
    )
    from python_multiproc_bigdata_spark.operators.warc import (
        pack_warcgz_shards,
        walk_warcgz_shards,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (3, "gamma"), (21, "delta words")],
        ["doc_id", "text"],
    )
    out = walk_warcgz_shards(pack_warcgz_shards(docs))
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {0, 3, 21}
    assert rows[0].content_md5 == hashlib.md5(synth_html(0, "alpha beta")).hexdigest()
    assert rows[0].text_md5 == hashlib.md5(
        expected_extraction(0, "alpha beta").encode()
    ).hexdigest()
    # a member holding TWO records violates the seekable convention
    rec = _warc_record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", "<urn:doc:1>"),
            ("WARC-Date", "2024-01-01T00:00:00Z"),
            ("WARC-Target-URI", "http://example.com/doc/1"),
        ],
        synth_html(1, "x"),
    )
    two = gzip_wrap(rec + rec)
    bad = spark.createDataFrame([(0, two, 2)], "shard_id long, archive binary, n_records long")
    with pytest.raises(Exception, match="holds 2 records"):
        walk_warcgz_shards(bad).collect()


def test_robots_parser_group_selection_and_rules():
    from python_multiproc_bigdata_spark.operators.warc import parse_robots

    body = (
        "# top comment\n"
        "User-agent: other\n"
        "Disallow: /\n"
        "\n"
        "User-agent: foo\n"
        "User-agent: pmb-bot  # inline comment\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
        "Crawl-delay: 10\n"
        "User-agent: late\n"
        "Disallow: /x\n"
    )
    # exact group wins; the unknown field ends the UA run, so 'late'
    # starts a NEW group whose rules do not leak into ours
    assert parse_robots(body, "PMB-Bot") == [
        ("/private", False),
        ("/private/ok", True),
    ]
    # no specific group -> '*' fallback; empty Disallow emits no rule
    star = "User-agent: *\nDisallow:\nAllow: /a\n"
    assert parse_robots(star, "pmb-bot") == [("/a", True)]
    # neither group -> empty rules (allow-all)
    assert parse_robots("User-agent: other\nDisallow: /\n", "pmb-bot") == []
    with pytest.raises(ValueError, match="wildcard"):
        parse_robots("User-agent: *\nDisallow: /a*\n", "pmb-bot")


def test_robots_gate_precedence(spark):
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.operators.warc import robots_gate

    rules = spark.createDataFrame(
        [
            ("h", "/a", False),
            ("h", "/a/b", True),
            ("h", "/a/b/c$", False),
            ("h", "/d", False),
            ("h", "/d/", True),  # same effective length as below
        ],
        ["host", "path_pattern", "allow"],
    )
    urls = spark.createDataFrame(
        [
            ("h", "/"),        # no match -> allowed
            ("h", "/a/x"),     # /a disallow
            ("h", "/a/b/x"),   # /a/b allow (longest)
            ("h", "/a/b/c"),   # anchored exact disallow (longest)
            ("h", "/a/b/cc"),  # anchor does NOT match -> /a/b allow
            ("nohost", "/a"),  # host without rules -> allowed
        ],
        ["host", "path"],
    )
    got = {
        (r.host, r.path): r.allowed
        for r in robots_gate(urls, rules).collect()
    }
    assert got == {
        ("h", "/"): True,
        ("h", "/a/x"): False,
        ("h", "/a/b/x"): True,
        ("h", "/a/b/c"): False,
        ("h", "/a/b/cc"): True,
        ("nohost", "/a"): True,
    }
    # allow-wins-ties: /d vs /d/ on '/d/' -- allow pattern is longer
    # here, so craft a true tie: equal-length allow and disallow
    tie = spark.createDataFrame(
        [("h", "/t1", False), ("h", "/t2", True)], ["host", "path_pattern", "allow"]
    )
    t = spark.createDataFrame(
        [("h", "/t1"), ("h", "/t2")], ["host", "path"]
    )
    gt = {r.path: r.allowed for r in robots_gate(t, tie).collect()}
    assert gt == {"/t1": False, "/t2": True}
    eq = spark.createDataFrame(
        [("h", "/p", False), ("h", "/p", True)], ["host", "path_pattern", "allow"]
    )
    e = spark.createDataFrame([("h", "/p/x")], ["host", "path"])
    assert robots_gate(e, eq).collect()[0].allowed is True


def test_fuzz_html_extraction_vs_stdlib():
    """Property fuzz: random well-formed pages (random text, attribute
    values with '>', nested-ish comments, random entities) must extract
    identically to stdlib html.parser — 60 adversarial examples per
    run."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.lists(
        st.text(alphabet="abcdefg hij", min_size=1, max_size=8), min_size=0, max_size=6
    )

    @settings(max_examples=60, deadline=None)
    @given(
        words,
        st.integers(0, 999),
        st.sampled_from(["&amp;", "&lt;", "&gt;", "&#65;", "&#x42;", ""]),
        st.text(alphabet="abc>x y", min_size=0, max_size=6),
    )
    def case(ws, n, ent, attr):
        attr_q = attr.replace('"', "")
        html = (
            f"<html><body><p id=\"a{n}\" data-v=\"{attr_q}\">"
            + " ".join(ws)
            + ent
            + f"</p><script>var x = '<q>{n}</q>';</script>"
            + f"<!-- c {n} <fake> -->tail</body></html>"
        )
        assert html_to_text(html) == _stdlib_extract(html)

    case()


def test_fuzz_warc_roundtrip():
    """Property fuzz: random record sets (binary payloads incl. CRLF
    runs and empty bodies, mixed record types) must frame and re-walk
    exactly — payload bytes identical, order preserved."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["response", "request", "metadata"]),
                st.binary(min_size=0, max_size=200),
            ),
            min_size=0,
            max_size=6,
        )
    )
    def case(recs):
        blob = b"".join(
            _warc_record(
                [
                    ("WARC-Type", typ),
                    ("WARC-Record-ID", f"<urn:r:{i}>"),
                    ("WARC-Date", "2024-01-01T00:00:00Z"),
                ],
                body,
            )
            for i, (typ, body) in enumerate(recs)
        )
        got = warc_records(blob)
        assert [(h["WARC-Type"], b) for h, b in got] == recs

    case()


def test_extract_links_hand_cases():
    """Link extraction hand cases: entity-decoded hrefs, quoted '>'
    inside attribute values, unquoted values, self-closing and
    closing tags skipped, and <a href> markup inside a raw-text
    script body NOT extracted."""
    from python_multiproc_bigdata_spark.operators.warc import extract_links

    html = (
        "<html><body>"
        '<a href="/x?a=1&amp;b=2" data-y=\'q>u\'>one</a>'
        "<a href=/bare>two</a>"
        '<a id="no-href">three</a>'
        '<script>var s = "<a href=\'/fake\'>";</script>'
        '<a href="HTTP://H.COM/p#f">four</a>'
        "</body></html>"
    )
    assert extract_links(html) == [
        "/x?a=1&b=2",
        "/bare",
        "HTTP://H.COM/p#f",
    ]


def test_extract_links_first_attr_wins_and_loud_gates():
    from python_multiproc_bigdata_spark.operators.warc import extract_links

    assert extract_links('<a href="/a" href="/b">x</a>') == ["/a"]
    with pytest.raises(ValueError, match="unknown named entity"):
        extract_links('<a href="/x?a=1&bogus;">x</a>')
    # an unclosed quote swallows the '>' — caught at the tag scan
    with pytest.raises(ValueError, match="unterminated tag"):
        extract_links('<a href="/unclosed>x</a>')
    from python_multiproc_bigdata_spark.operators.warc import _tag_attrs

    with pytest.raises(ValueError, match="unterminated attribute"):
        _tag_attrs(" href='/unclosed")


def test_synth_html_links_closed_form():
    """Every absolute link of synth_html_links matches the closed form
    the crawl_link_graph oracle replays; the two relative hrefs are
    present on every page."""
    from python_multiproc_bigdata_spark.operators.warc import (
        extract_links,
        synth_html_links,
    )

    for d in (0, 1, 5, 12, 37):
        links = extract_links(synth_html_links(d, "t").decode())
        assert links[0] == "/h?a=1&b=2" and links[-1] == "/local"
        absl = links[1:-1]
        assert len(absl) == 2 + d % 3
        for k, href in enumerate(absl):
            h = (d * 7 + k * 13) % 10
            scheme = "HTTP" if (d + k) % 2 == 0 else "https"
            psel = (d + k) % 3
            port = (
                (":80" if scheme == "HTTP" else ":443")
                if psel == 0
                else (":8080" if psel == 1 else "")
            )
            query = "?b=2&a=1" if k % 2 == 0 else ""
            frag = "#s" if k % 3 == 0 else ""
            assert href == (
                f"{scheme}://T{h}.Example.ORG{port}"
                f"/l{k}/./d{d % 5}/x/../p{query}{frag}"
            )
