"""WARC (ISO 28500) crawl-archive ingest + from-spec HTML main-text
extraction — the FRONT DOOR of a web-crawl training-data pipeline
(Common Crawl ships WARC; the 'WET' text the LLM pipelines consume is
exactly extract(strip(HTML))). Both layers are parsed from their public
specs with the repo's loud-gate posture:

- WARC: version line `WARC/1.0`, named-field headers terminated by a
  blank line, `Content-Length` octet-exact payload slicing, the
  mandatory `\r\n\r\n` record terminator, required-field validation
  (WARC-Type / WARC-Record-ID / WARC-Date / Content-Length), and
  non-response records (warcinfo, request) on the checked skip path.
- HTML: a strict tokenizer over the spec surface an extractor needs —
  tags with quoted attribute values (a `>` inside quotes must not
  close the tag), `<!-- -->` comments (including `--` runs inside),
  `<!DOCTYPE>`/`<?...?>` declarations, raw-text `script`/`style`
  elements (their content is NOT character data and may contain fake
  tags), and character references (the five predefined named entities
  plus decimal `&#NN;` and hex `&#xHH;`). Character data is
  whitespace-collapsed to single spaces, the WET convention. Strict
  subset, loudly enforced: unterminated comments/tags/entities and
  unknown named entities raise rather than guess — this is an ingest
  QUALITY GATE, not a lenient browser.

Reference parity note: the reference walks files as opaque payloads
(v2/core/extractors/files.py); crawl-archive ingest is beyond-reference
surface, sibling to the ZIP/ustar/tar.gz shard walkers
(operators/archives.py).

Cross-implementation check: tests/test_warc_html.py replays extraction
through stdlib html.parser + html.unescape (code this module never
touches) and asserts equality on the synth corpus and hand cases.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SHARD_SIZE = 16

NAMED_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
}

RAW_TEXT_TAGS = ("script", "style")


def synth_html(doc_id: int, text: str) -> bytes:
    """Deterministic HTML page wrapping a doc's text, with every trap
    the extractor must survive ON the checked path: entities in title
    and footer, a script whose body contains `<p>` markup and bare
    `<`/`>`/`&&`, a style with comment-ish content, a quoted attribute
    value containing `>`, an HTML comment with `--` runs and fake
    tags, and decimal + hex character references. The whole page is a
    concat of literals + doc_id + text, so the DuckDB oracle rebuilds
    it (and the expected extraction) in plain SQL."""
    return (
        "<!DOCTYPE html>\n"
        f"<html><head><title>Doc {doc_id} &amp; friends</title>\n"
        "<style>body { color: #fff; } /* a > b < c */</style>\n"
        '<script>if (a < b && c > d) { s = "<p>not text</p>"; }</script>\n'
        "</head><body>\n"
        "<nav><a href=\"/h?a=1&amp;b=2\" data-x='q>u'>Home &gt; Index</a></nav>\n"
        f"<!-- hidden <em>markup</em> -- {doc_id} -->\n"
        f'<h1 id="t{doc_id}">Doc &#72;eading &#x21;</h1>\n'
        f"<p>{text}</p>\n"
        "<footer>&quot;fin&quot; &lt;eof&gt;</footer>\n"
        "</body></html>\n"
    ).encode("utf-8")


def html_to_text(html: str) -> str:
    """From-spec strict HTML → text: walk tags/comments/declarations,
    skip raw-text script/style content, decode character references in
    character data, and collapse all whitespace runs to single spaces
    (WET convention). Raises loudly on the malformed cases the module
    docstring names."""
    out: list[str] = []
    i = 0
    n = len(html)
    low = html.lower()  # once — raw-text close-tag scans reuse it
    while i < n:
        c = html[i]
        if c == "<":
            if html.startswith("<!--", i):
                end = html.find("-->", i + 4)
                if end < 0:
                    raise ValueError(f"unterminated comment at {i}")
                i = end + 3
                continue
            if html.startswith("<!", i) or html.startswith("<?", i):
                end = html.find(">", i)
                if end < 0:
                    raise ValueError(f"unterminated declaration at {i}")
                i = end + 1
                continue
            # tag: find the true '>', honoring quoted attribute values
            j = i + 1
            closing = j < n and html[j] == "/"
            if closing:
                j += 1
            k = j
            while k < n and (html[k].isalnum() or html[k] in "-_"):
                k += 1
            name = html[j:k].lower()
            if not name:
                raise ValueError(f"bare '<' at {i} (not a tag)")
            quote = ""
            end = -1
            while k < n:
                ch = html[k]
                if quote:
                    if ch == quote:
                        quote = ""
                elif ch in "\"'":
                    quote = ch
                elif ch == ">":
                    end = k
                    break
                k += 1
            if end < 0:
                raise ValueError(f"unterminated tag <{name} at {i}")
            self_closing = html[end - 1] == "/"
            i = end + 1
            if not closing and not self_closing and name in RAW_TEXT_TAGS:
                # HTML raw-text end-tag rule: '</name' closes only when
                # followed by '>', '/', or whitespace — '</scripting>'
                # does NOT end a <script> element
                close = low.find(f"</{name}", i)
                stop = len(name) + 2
                while close >= 0 and (
                    close + stop < n and low[close + stop] not in ">/ \t\n\r\f"
                ):
                    close = low.find(f"</{name}", close + 1)
                if close < 0:
                    raise ValueError(f"unterminated raw-text <{name}> at {i}")
                gt = html.find(">", close)
                if gt < 0:
                    raise ValueError(f"unterminated </{name}> at {close}")
                i = gt + 1
            continue
        if c == "&":
            semi = html.find(";", i + 1)
            if semi < 0 or semi - i > 32:
                raise ValueError(f"unterminated character reference at {i}")
            body = html[i + 1 : semi]
            if body.startswith("#x") or body.startswith("#X"):
                out.append(chr(int(body[2:], 16)))
            elif body.startswith("#"):
                out.append(chr(int(body[1:], 10)))
            elif body in NAMED_ENTITIES:
                out.append(NAMED_ENTITIES[body])
            else:
                raise ValueError(f"unknown named entity &{body}; at {i}")
            i = semi + 1
            continue
        out.append(c)
        i += 1
    return " ".join("".join(out).split())


def expected_extraction(doc_id: int, text: str) -> str:
    """The closed-form extraction of synth_html — what html_to_text
    must earn by parsing. Cited by the SQL oracle."""
    joined = f'Doc {doc_id} & friends Home > Index Doc Heading ! {text} "fin" <eof>'
    return " ".join(joined.split())


WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("text_md5", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType()),
        T.StructField("archive", T.BinaryType()),
        T.StructField("n_records", T.LongType()),
    ]
)


def _warc_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"WARC/1.0\r\n"
    for k, v in headers:
        head += f"{k}: {v}\r\n".encode()
    head += f"Content-Length: {len(payload)}\r\n".encode()
    return head + b"\r\n" + payload + b"\r\n\r\n"


def pack_warc_shards(
    docs: DataFrame, shard_size: int = WARC_SHARD_SIZE, page_fn=None
) -> DataFrame:
    """Pack (doc_id, text) rows into WARC shards of `shard_size` docs:
    one bounded applyInPandas group per shard (the zip-shard shape).
    Each shard leads with a warcinfo record and a request record —
    non-response types the walker must SKIP — then one response record
    per doc (sorted by doc_id) whose payload is the synth_html page
    (`page_fn` overrides the page builder — the link-graph corpus
    passes synth_html_links)."""
    page_fn = page_fn or synth_html

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["shard_id"].iloc[0])
        blob = bytearray()
        blob += _warc_record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Record-ID", f"<urn:info:{sid}>"),
                ("WARC-Date", "2024-01-01T00:00:00Z"),
            ],
            b"software: pmb-spark-warc\r\n",
        )
        blob += _warc_record(
            [
                ("WARC-Type", "request"),
                ("WARC-Record-ID", f"<urn:req:{sid}>"),
                ("WARC-Date", "2024-01-01T00:00:00Z"),
                ("WARC-Target-URI", f"http://example.com/shard/{sid}"),
            ],
            b"GET / HTTP/1.1\r\n",
        )
        count = 0
        for doc_id, text in sorted(zip(pdf["doc_id"], pdf["text"])):
            payload = page_fn(int(doc_id), str(text))
            blob += _warc_record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Record-ID", f"<urn:doc:{int(doc_id)}>"),
                    ("WARC-Date", "2024-01-01T00:00:00Z"),
                    ("WARC-Target-URI", f"http://example.com/doc/{int(doc_id)}"),
                    ("Content-Type", "text/html"),
                ],
                payload,
            )
            count += 1
        return pd.DataFrame(
            {"shard_id": [sid], "archive": [bytes(blob)], "n_records": [count]}
        )

    shards = docs.select(
        F.floor(F.col("doc_id") / shard_size).cast("long").alias("shard_id"),
        "doc_id",
        "text",
    )
    return shards.groupBy("shard_id").applyInPandas(pack, _SHARD_SCHEMA)


def warc_records(payload: bytes) -> list[tuple[dict, bytes]]:
    """Walk a WARC blob per ISO 28500: version line, header fields to
    the blank line, Content-Length payload slice, `\\r\\n\\r\\n`
    terminator, required-field validation. Returns every record as
    (headers, payload) — callers filter by WARC-Type. Raises loudly on
    framing violations."""
    out: list[tuple[dict, bytes]] = []
    pos = 0
    n = len(payload)
    while pos < n:
        eol = payload.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError(f"missing version line terminator at {pos}")
        version = payload[pos:eol]
        if version != b"WARC/1.0":
            raise ValueError(f"unsupported WARC version {version!r} at {pos}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = payload.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError(f"unterminated header block at {pos}")
            line = payload[pos:eol]
            pos = eol + 2
            if not line:
                break
            key, sep, value = line.partition(b": ")
            if not sep:
                raise ValueError(f"malformed header line {line!r}")
            headers[key.decode()] = value.decode()
        for req in ("WARC-Type", "WARC-Record-ID", "WARC-Date", "Content-Length"):
            if req not in headers:
                raise ValueError(f"record missing required field {req}")
        length = int(headers["Content-Length"])
        body = payload[pos : pos + length]
        if len(body) != length:
            raise ValueError("record payload truncated")
        pos += length
        if payload[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError("missing record terminator")
        pos += 4
        out.append((headers, body))
    return out


def pack_warcgz_shards(
    docs: DataFrame, shard_size: int = WARC_SHARD_SIZE
) -> DataFrame:
    """warc.gz sibling of pack_warc_shards — the format Common Crawl
    actually ships: ONE gzip member per record (RFC 1952 multi-member
    concatenation, so a reader can seek to a record without inflating
    the file), each member wrapping one full WARC record, built with
    the from-spec gzip_wrap (operators/archives.py)."""
    from python_multiproc_bigdata_spark.operators.archives import gzip_wrap

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["shard_id"].iloc[0])
        blob = bytearray()
        blob += gzip_wrap(
            _warc_record(
                [
                    ("WARC-Type", "warcinfo"),
                    ("WARC-Record-ID", f"<urn:info:{sid}>"),
                    ("WARC-Date", "2024-01-01T00:00:00Z"),
                ],
                b"software: pmb-spark-warc\r\n",
            ),
            fname=f"info_{sid}.warc".encode(),
        )
        count = 0
        for doc_id, text in sorted(zip(pdf["doc_id"], pdf["text"])):
            payload = synth_html(int(doc_id), str(text))
            rec = _warc_record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Record-ID", f"<urn:doc:{int(doc_id)}>"),
                    ("WARC-Date", "2024-01-01T00:00:00Z"),
                    ("WARC-Target-URI", f"http://example.com/doc/{int(doc_id)}"),
                    ("Content-Type", "text/html"),
                ],
                payload,
            )
            blob += gzip_wrap(rec)
            count += 1
        return pd.DataFrame(
            {"shard_id": [sid], "archive": [bytes(blob)], "n_records": [count]}
        )

    shards = docs.select(
        F.floor(F.col("doc_id") / shard_size).cast("long").alias("shard_id"),
        "doc_id",
        "text",
    )
    return shards.groupBy("shard_id").applyInPandas(pack, _SHARD_SCHEMA)


def walk_warcgz_shards(shards: DataFrame) -> DataFrame:
    """Walk warc.gz shards: split the multi-member gzip stream
    (operators/archives.py:gzip_members — CRC/ISIZE verified per
    member), require EXACTLY one WARC record per member (the seekable
    convention), then the same response-record extraction rows as
    walk_warc_shards. Map-only, zero shuffle."""
    from python_multiproc_bigdata_spark.operators.archives import gzip_members

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in WARC_RECORD_SCHEMA.fields}
            for sid, blob in zip(pdf["shard_id"], pdf["archive"]):
                for member in gzip_members(bytes(blob)):
                    recs = warc_records(member)
                    if len(recs) != 1:
                        raise ValueError(
                            f"warc.gz member holds {len(recs)} records (want 1)"
                        )
                    headers, body = recs[0]
                    if headers["WARC-Type"] != "response":
                        continue
                    uri = headers["WARC-Target-URI"]
                    doc_id = int(uri.rsplit("/", 1)[1])
                    text = html_to_text(body.decode("utf-8"))
                    rows["shard_id"].append(int(sid))
                    rows["doc_id"].append(doc_id)
                    rows["n_bytes"].append(len(body))
                    rows["content_md5"].append(hashlib.md5(body).hexdigest())
                    rows["text_md5"].append(
                        hashlib.md5(text.encode("utf-8")).hexdigest()
                    )
                    rows["n_chars"].append(len(text))
            yield pd.DataFrame(rows)

    return shards.mapInPandas(batches, WARC_RECORD_SCHEMA)


def walk_warc_shards(shards: DataFrame) -> DataFrame:
    """Walk binary WARC shards via mapInPandas: 1 blob in → one row per
    RESPONSE record out (warcinfo/request records skipped on the
    checked path), with the payload md5 AND the extracted-text md5 +
    length, so the oracle value-checks both the WARC framing and the
    HTML extraction byte-for-byte. Map-only, zero shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in WARC_RECORD_SCHEMA.fields}
            for sid, blob in zip(pdf["shard_id"], pdf["archive"]):
                for headers, body in warc_records(bytes(blob)):
                    if headers["WARC-Type"] != "response":
                        continue
                    uri = headers["WARC-Target-URI"]
                    doc_id = int(uri.rsplit("/", 1)[1])
                    text = html_to_text(body.decode("utf-8"))
                    rows["shard_id"].append(int(sid))
                    rows["doc_id"].append(doc_id)
                    rows["n_bytes"].append(len(body))
                    rows["content_md5"].append(hashlib.md5(body).hexdigest())
                    rows["text_md5"].append(
                        hashlib.md5(text.encode("utf-8")).hexdigest()
                    )
                    rows["n_chars"].append(len(text))
            yield pd.DataFrame(rows)

    return shards.mapInPandas(batches, WARC_RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309) — the crawl-side ADMISSION gate that runs before
# any fetch enters a WARC: group selection by user-agent (the most
# specific matching group wins; '*' is the fallback; a group with no
# match allows everything), then per-URL rule matching with
# LONGEST-MATCH precedence and allow-wins-ties. Patterns supported:
# plain path prefixes and the '$' end anchor (the RFC's '*' wildcard is
# not generated by the synth corpus and is rejected loudly — strict
# subset, not silent wrong answers). Parsing runs in Arrow batches (the
# per-host robots dim is small); URL matching stays JVM-side as a
# broadcast join + max_by argmax.
# ---------------------------------------------------------------------------

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("path_pattern", T.StringType()),
        T.StructField("allow", T.BooleanType()),
    ]
)


def parse_robots(body: str, agent: str) -> list[tuple[str, bool]]:
    """Parse a robots.txt body per RFC 9309 for one product token:
    comments stripped, blank-line-tolerant, consecutive User-agent
    lines share a group, and the EFFECTIVE rule set is the
    exact-match group's if one exists else the '*' group's (empty if
    neither). Returns (path_pattern, allow) rules; '*' wildcards in
    patterns raise (unsupported subset, loud)."""
    agent = agent.lower()
    specific: list[tuple[str, bool]] = []
    star: list[tuple[str, bool]] = []
    cur_agents: list[str] = []
    last_was_rule = True
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if last_was_rule:
                cur_agents = []
            cur_agents.append(value.lower())
            last_was_rule = False
        elif field in ("allow", "disallow"):
            last_was_rule = True
            if not value and field == "disallow":
                continue  # 'Disallow:' (empty) = allow all, no rule
            if "*" in value:
                raise ValueError(f"unsupported '*' wildcard in rule {raw!r}")
            rule = (value, field == "allow")
            if agent in cur_agents:
                specific.append(rule)
            if "*" in cur_agents:
                star.append(rule)
        else:
            last_was_rule = True  # unknown fields end the UA run (RFC)
    return specific if specific else star


def robots_rules(robots: DataFrame, agent: str) -> DataFrame:
    """(host, robots_txt) → exploded effective rule rows for `agent`
    (host, path_pattern, allow) via mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"host": [], "path_pattern": [], "allow": []}
            for host, body in zip(pdf["host"], pdf["robots_txt"]):
                for pattern, allow in parse_robots(str(body), agent):
                    rows["host"].append(str(host))
                    rows["path_pattern"].append(pattern)
                    rows["allow"].append(allow)
            yield pd.DataFrame(rows)

    return robots.mapInPandas(batches, ROBOTS_SCHEMA)


def robots_gate(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """Admission verdict per (host, path) row under RFC 9309 matching,
    all JVM-side: rules broadcast onto the URL relation by host, a
    rule matches if the path starts with its pattern (or equals it,
    for '$'-anchored patterns), and the verdict is the matched rule
    with the LONGEST pattern (allow wins length ties); no match →
    allowed. Adds an `allowed` boolean."""
    anchored = F.col("path_pattern").endswith("$")
    pat = F.when(
        anchored, F.expr("substring(path_pattern, 1, length(path_pattern) - 1)")
    ).otherwise(F.col("path_pattern"))
    r = rules.select(
        "host",
        pat.alias("_pat"),
        anchored.alias("_anchored"),
        F.col("allow").alias("_allow"),
    )
    joined = urls.join(F.broadcast(r), "host", "left")
    matches = joined.withColumn(
        "_hit",
        F.when(
            F.col("_pat").isNull(), F.lit(False)
        ).otherwise(
            F.when(F.col("_anchored"), F.col("path") == F.col("_pat")).otherwise(
                F.col("path").startswith(F.col("_pat"))
            )
        ),
    )
    key_cols = [c for c in urls.columns]
    verdict = (
        matches.groupBy(*key_cols)
        .agg(
            F.max_by(
                F.col("_allow"),
                F.when(
                    F.col("_hit"),
                    F.struct(
                        F.length("_pat").alias("l"),
                        F.col("_allow").cast("int").alias("a"),
                    ),
                ),
            ).alias("_best")
        )
        .withColumn("allowed", F.coalesce(F.col("_best"), F.lit(True)))
        .drop("_best")
    )
    return verdict


WARC_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def warc_texts(shards: DataFrame) -> DataFrame:
    """walk_warc_shards' text-bearing sibling: response records →
    (shard_id, doc_id, host, extracted_text) rows — the WET stage a
    downstream curation pipeline consumes directly (the md5 walker is
    the integrity gate; this one hands the text on). Map-only."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in WARC_TEXT_SCHEMA.fields}
            for sid, blob in zip(pdf["shard_id"], pdf["archive"]):
                for headers, body in warc_records(bytes(blob)):
                    if headers["WARC-Type"] != "response":
                        continue
                    uri = headers["WARC-Target-URI"]
                    rows["shard_id"].append(int(sid))
                    rows["doc_id"].append(int(uri.rsplit("/", 1)[1]))
                    rows["host"].append(uri.split("/")[2])
                    rows["text"].append(html_to_text(body.decode("utf-8")))
            yield pd.DataFrame(rows)

    return shards.mapInPandas(batches, WARC_TEXT_SCHEMA)


# ---------------------------------------------------------------------------
# Link-graph extraction (r12): hrefs out of the HTML the crawl family
# already walks — the edge-list stage between WET extraction and the
# PageRank/robots curation family. Attribute parsing is from-spec
# (quoted and unquoted values, entity decoding with the same loud
# unknown-entity gate as html_to_text).
# ---------------------------------------------------------------------------


def decode_char_refs(s: str) -> str:
    """Decode character references in an attribute value — same rules
    and loud gates as html_to_text's character-data path (named set,
    decimal, hex; unknown or unterminated raises)."""
    out: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c != "&":
            out.append(c)
            i += 1
            continue
        semi = s.find(";", i + 1)
        if semi < 0 or semi - i > 32:
            raise ValueError(f"unterminated character reference at {i}")
        body = s[i + 1 : semi]
        if body.startswith("#x") or body.startswith("#X"):
            out.append(chr(int(body[2:], 16)))
        elif body.startswith("#"):
            out.append(chr(int(body[1:], 10)))
        elif body in NAMED_ENTITIES:
            out.append(NAMED_ENTITIES[body])
        else:
            raise ValueError(f"unknown named entity &{body}; at {i}")
        i = semi + 1
    return "".join(out)


def _tag_attrs(body: str) -> dict:
    """Parse the attribute region of one tag (everything between the
    tag name and '>'): name[=value] pairs, values quoted (either
    quote) or unquoted-to-whitespace, names lowercased, values
    entity-decoded. First occurrence wins (the HTML duplicate rule)."""
    attrs: dict[str, str] = {}
    i = 0
    n = len(body)
    while i < n:
        while i < n and body[i] in " \t\n\r\f/":
            i += 1
        if i >= n:
            break
        j = i
        while j < n and body[j] not in "= \t\n\r\f/":
            j += 1
        name = body[i:j].lower()
        k = j
        while k < n and body[k] in " \t\n\r\f":
            k += 1
        if k < n and body[k] == "=":
            k += 1
            while k < n and body[k] in " \t\n\r\f":
                k += 1
            if k < n and body[k] in "\"'":
                q = body[k]
                e = body.find(q, k + 1)
                if e < 0:
                    raise ValueError(f"unterminated attribute value at {k}")
                val = body[k + 1 : e]
                i = e + 1
            else:
                e = k
                while e < n and body[e] not in " \t\n\r\f":
                    e += 1
                val = body[k:e]
                i = e
        else:
            val = ""
            i = k
        if name and name not in attrs:
            attrs[name] = decode_char_refs(val)
    return attrs


def extract_links(html: str) -> list[str]:
    """All <a href> values of a page in document order, entity-decoded
    — the same strict tag walk as html_to_text (quoted '>' inside
    attribute values honored, raw-text script/style bodies skipped,
    comments/declarations skipped), capturing instead of stripping."""
    links: list[str] = []
    i = 0
    n = len(html)
    low = html.lower()
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            break
        i = lt
        if html.startswith("<!--", i):
            end = html.find("-->", i + 4)
            if end < 0:
                raise ValueError(f"unterminated comment at {i}")
            i = end + 3
            continue
        if html.startswith("<!", i) or html.startswith("<?", i):
            end = html.find(">", i)
            if end < 0:
                raise ValueError(f"unterminated declaration at {i}")
            i = end + 1
            continue
        j = i + 1
        closing = j < n and html[j] == "/"
        if closing:
            j += 1
        k = j
        while k < n and (html[k].isalnum() or html[k] in "-_"):
            k += 1
        name = html[j:k].lower()
        if not name:
            raise ValueError(f"bare '<' at {i} (not a tag)")
        quote = ""
        end = -1
        kk = k
        while kk < n:
            ch = html[kk]
            if quote:
                if ch == quote:
                    quote = ""
            elif ch in "\"'":
                quote = ch
            elif ch == ">":
                end = kk
                break
            kk += 1
        if end < 0:
            raise ValueError(f"unterminated tag <{name} at {i}")
        self_closing = html[end - 1] == "/"
        if not closing and name == "a":
            attrs = _tag_attrs(html[k : end - (1 if self_closing else 0)])
            if "href" in attrs:
                links.append(attrs["href"])
        i = end + 1
        if not closing and not self_closing and name in RAW_TEXT_TAGS:
            close = low.find(f"</{name}", i)
            stop = len(name) + 2
            while close >= 0 and (
                close + stop < n and low[close + stop] not in ">/ \t\n\r\f"
            ):
                close = low.find(f"</{name}", close + 1)
            if close < 0:
                raise ValueError(f"unterminated raw-text <{name}> at {i}")
            gt = html.find(">", close)
            if gt < 0:
                raise ValueError(f"unterminated </{name}> at {close}")
            i = gt + 1
    return links


def synth_html_links(doc_id: int, text: str) -> bytes:
    """synth_html plus a deterministic outbound-link block inserted
    before the footer: 2 + doc_id%3 absolute links with every
    normalization trap live (mixed-case scheme/host, default and
    non-default ports, './'+'..' dot segments, entity-coded unsorted
    query, fragment) targeting hosts t0..t9.example.org, plus one
    page-relative link ('/local'; synth_html's nav '/h?a=1&b=2' makes
    two relative hrefs per page). The closed normalized form is
    replayed by the crawl_link_graph oracle."""
    base = synth_html(doc_id, text).decode("utf-8")
    items = []
    for k in range(2 + doc_id % 3):
        h = (doc_id * 7 + k * 13) % 10
        scheme = "HTTP" if (doc_id + k) % 2 == 0 else "https"
        psel = (doc_id + k) % 3
        if psel == 0:
            port = ":80" if scheme == "HTTP" else ":443"
        elif psel == 1:
            port = ":8080"
        else:
            port = ""
        query = "?b=2&amp;a=1" if k % 2 == 0 else ""
        frag = "#s" if k % 3 == 0 else ""
        items.append(
            f'<li><a href="{scheme}://T{h}.Example.ORG{port}'
            f'/l{k}/./d{doc_id % 5}/x/../p{query}{frag}">x</a></li>'
        )
    block = '<ul id="links">' + "".join(items) + '<li><a href="/local">y</a></li></ul>\n'
    return base.replace("<footer>", block + "<footer>", 1).encode("utf-8")


WARC_LINK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("href", T.StringType()),
    ]
)


def warc_links(shards: DataFrame) -> DataFrame:
    """Walk WARC shards and emit one (doc_id, href) row per extracted
    <a href> of every response record — mapInPandas, map-only; the
    edge-list front of the link-graph family."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            doc_ids: list[int] = []
            hrefs: list[str] = []
            for blob in pdf["archive"]:
                for headers, payload in warc_records(bytes(blob)):
                    if headers.get("WARC-Type") != "response":
                        continue
                    rid = headers["WARC-Record-ID"]
                    doc_id = int(rid.split(":")[2].rstrip(">"))
                    for href in extract_links(payload.decode("utf-8")):
                        doc_ids.append(doc_id)
                        hrefs.append(href)
            yield pd.DataFrame({"doc_id": doc_ids, "href": hrefs})

    return shards.mapInPandas(batches, WARC_LINK_SCHEMA)
