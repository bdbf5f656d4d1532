"""Corpus-curation operators (beyond-reference, training-data pipeline):
repetition signals, eval-set decontamination, and duplicate-cluster
canonicalization — the steps between "near-dup pairs exist" and "here is
the cleaned training corpus".

All hashing/sampling is deterministic (md5 / id arithmetic) so the DuckDB
oracles reproduce results bit-for-bit, per the repo-wide rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.text import WHITESPACE_RE


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher/C4-style repetition counters per document, as INTEGERS
    (ratios are left to the caller: integer outputs keep the oracle
    hash-exact — a ratio like 1/32 lands on a 4-decimal half-boundary
    where engine rounding modes diverge).

      n_lines            non-empty lines
      n_dup_lines        lines minus distinct lines (duplicate-line count)
      max_line_repeats   occurrences of the most-repeated line
      n_tokens           whitespace tokens
      n_distinct_tokens  vocabulary size of the doc
      top_token_count    occurrences of the most frequent token
      top_bigram_count   occurrences of the most frequent token 2-gram
                         (0 for docs with < 2 tokens)

    Every metric is an explode + two partial-aggregated groupBys —
    word-count shaped, scales like the tokenizer. (The harness corpus has
    no newlines, so the line columns are flat there — they matter on real
    scraped text; the token/bigram columns carry the signal either way.)"""
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda ln: F.length(F.trim(ln)) > 0
    )
    toks_expr = F.filter(
        F.split(F.col(text_col), WHITESPACE_RE), lambda w: F.length(w) > 0
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        lines.alias("_lines"),
        toks_expr.alias("_toks"),
    )
    # most-repeated line, array-side: sort, then the longest run of equal
    # neighbors would need a scan — use explode+groupBy instead (same
    # shape as the bigram mode, one pass for both)
    line_counts = (
        base.select("doc_id", F.explode("_lines").alias("ln"))
        .groupBy("doc_id", "ln")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_lines"),
            (F.sum("c") - F.count(F.lit(1))).alias("n_dup_lines"),
            F.max("c").alias("max_line_repeats"),
        )
    )
    toks = base.select("doc_id", F.size("_toks").alias("n_tokens"), F.col("_toks"))
    token_stats = (
        base.select("doc_id", F.explode("_toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.max("c").alias("top_token_count"),
        )
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.col("n_tokens") >= 2,
                F.zip_with(
                    F.slice("_toks", 1, F.size("_toks") - 1),
                    F.slice("_toks", 2, F.size("_toks") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ).otherwise(F.array())
        ).alias("bg"),
    )
    bigram_top = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"))
    )
    # docs with no tokens/bigrams produce no grouped rows → left join,
    # fill 0; doc universe comes from the (map-only) token relation
    out = (
        toks.select("doc_id", "n_tokens")
        .join(line_counts, "doc_id", "left")
        .join(token_stats, "doc_id", "left")
        .join(bigram_top, "doc_id", "left")
        .na.fill(
            {
                "n_lines": 0,
                "n_dup_lines": 0,
                "max_line_repeats": 0,
                "n_distinct_tokens": 0,
                "top_token_count": 0,
                "top_bigram_count": 0,
            }
        )
    )
    return out.select(
        "doc_id", "n_lines", "n_dup_lines", "max_line_repeats", "n_tokens",
        "n_distinct_tokens", "top_token_count", "top_bigram_count",
    )


def ngram_arrays(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, grams) with grams = the DISTINCT word n-gram array per row —
    map-side only (same HOF discipline as word_shingles). The array form
    lets callers take size() without paying an explode+shuffle."""
    toks_expr = F.filter(
        F.split(F.col(text_col), WHITESPACE_RE), lambda w: F.length(w) > 0
    )
    t = df.select(F.col(id_col).alias("id"), toks_expr.alias("_toks"))
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array())
    return t.select("id", F.array_distinct(grams).alias("grams"))


def ngram_set(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct word n-gram relation (id, gram) — decontamination's unit
    of evidence. Map-side only. NOT expressed over ngram_arrays: the
    explode must sit in the same select as the array construction, or
    CollapseProject + InferFiltersFromGenerate clone the whole gram
    expression into an inferred filter (measured 1 -> ~15 split() copies
    in the optimized plan)."""
    toks_expr = F.filter(
        F.split(F.col(text_col), WHITESPACE_RE), lambda w: F.length(w) > 0
    )
    t = df.select(F.col(id_col).alias("id"), toks_expr.alias("_toks"))
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array())
    return t.select("id", F.explode(F.array_distinct(grams)).alias("gram"))


def boilerplate_ngrams(
    df: DataFrame,
    n: int = 5,
    min_doc_freq: int = 2,
    top_k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate mining (the C4/CCNet prefilter): the corpus's most
    document-frequent word n-grams — license headers, templates, nav
    chrome — ranked by doc frequency (ties → gram asc, so the cut is
    deterministic). The output feeds the dedup frequency caps
    (ngram_jaccard's max_shingle_freq) and line-level strip rules.

    Plan: one map-side distinct-gram scan + one partial-aggregated
    count + a top-k — word-count shaped, no skew risk beyond the hot
    grams themselves (which partial aggregation absorbs: each mapper
    emits one row per gram)."""
    return (
        ngram_set(df, id_col, text_col, n)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_doc_freq)
        .orderBy(F.desc("doc_freq"), F.asc("gram"))
        .limit(top_k)
    )


def strip_boilerplate_lines(
    df: DataFrame,
    min_doc_freq: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Line-level boilerplate removal (the C4 cleanup rule): drop every
    line whose trimmed form appears in ≥ min_doc_freq distinct documents
    (nav chrome, license banners, template footers), preserving the
    order of surviving lines. Returns (id, text, n_lines_dropped).

    Plan: one map-side line scan → doc-freq count → the hot-line set is
    SMALL by construction (only lines frequent across docs survive the
    HAVING), so it broadcasts and the strip is a map-side
    array_except-style filter over each document's line array — the
    corpus rebuilds in a single pass with no per-document shuffle. Lines
    compare trimmed; blank lines are never counted as boilerplate."""
    lines_arr = F.split(F.col(text_col), "\n")
    doc_lines = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.transform(lines_arr, lambda ln: F.trim(ln)),
                    lambda ln: F.length(ln) > 0,
                )
            )
        ).alias("ln"),
    )
    hot = (
        doc_lines.groupBy("ln")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") >= min_doc_freq)
        .select(F.collect_set("ln").alias("hot"))
    )
    # hot is ONE row (a set aggregate) — crossJoin broadcasts it to every
    # document; at scale this is the broadcast of a small dictionary
    src = df.select(F.col(id_col).alias("id"), lines_arr.alias("_lines"))
    kept = F.filter(
        F.col("_lines"), lambda ln: ~F.array_contains(F.col("hot"), F.trim(ln))
    )
    return (
        src.crossJoin(F.broadcast(hot))
        .select(
            "id",
            F.concat_ws("\n", kept).alias("text"),
            (F.size("_lines") - F.size(kept)).alias("n_lines_dropped"),
        )
    )


def decontaminate_overlap(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word n-gram
    with an eval/benchmark document (the published 13-gram rule; n is a
    parameter). Returns (train_id, eval_id, n_shared_grams) per
    contaminated pair.

    Plan shape: two map-only n-gram scans, an equi-join on the gram, one
    partial-aggregated count. At 100 TB the eval side is tiny (benchmark
    suites are MBs) — hash its gram set and let AQE broadcast it, making
    decontamination a map-side join over the training scan; cap
    degenerate grams upstream like ngram_jaccard if a benchmark contains
    boilerplate."""
    tg = ngram_set(train, id_col, text_col, n).withColumnRenamed("id", "train_id")
    eg = ngram_set(eval_set, id_col, text_col, n).withColumnRenamed("id", "eval_id")
    return (
        tg.join(eg, tg.gram == eg.gram)
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def decontamination_fraction(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    flag_threshold: float = 0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document FRACTIONAL contamination (the published corpus-
    cleaning rule: drop a training doc when more than X% of its word
    n-grams appear anywhere in the eval suite — a doc sharing one
    boilerplate gram is noise, a doc 30% covered is a leak).
    Complements decontaminate_overlap, which emits per-PAIR evidence.

    Emits (train_id, n_grams, n_contaminated, contamination_frac,
    flagged) for every training doc with ≥1 n-gram (docs shorter than n
    tokens have nothing to leak and are omitted).

    Plan: the eval gram set is distinct-collapsed and LEFT SEMI-joined
    against the training grams — at 100 TB the eval side is a benchmark
    suite (MBs), so the semi-join broadcasts and contamination scoring
    is a map-side pass over the training gram scan; two partial-agg
    groupBys on the doc id do the rest."""
    tg = ngram_set(train, id_col, text_col, n)
    eg = ngram_set(eval_set, id_col, text_col, n).select("gram").distinct()
    totals = tg.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        tg.join(eg, "gram", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    frac = F.round(F.col("n_contaminated") / F.col("n_grams"), 4)
    return (
        totals.join(hits, "id", "left")
        .na.fill({"n_contaminated": 0})
        .select(
            F.col("id").alias("train_id"),
            "n_grams",
            "n_contaminated",
            frac.alias("contamination_frac"),
            (frac >= flag_threshold).alias("flagged"),
        )
    )


def cap_source_share(
    docs_tokens: DataFrame,
    cap_frac: float,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Per-source token-share capping (the domain-cap rule: no single
    source/domain may exceed `cap_frac` of the corpus's tokens —
    protects the mix from one crawl dominating). Docs are admitted in
    deterministic id order within their source until the source's
    running token sum would pass the cap; emits one summary row per
    source: (source, n_docs, total_tokens, kept_docs, kept_tokens,
    cap_tokens).

    Plan: one scalar total (1-row broadcast fan-out), one per-source
    window prefix-sum (the shuffle key is the source — a skewed crawl
    IS the case this operator exists for, and its window still
    processes that source's rows on one task ordered by id; salt by a
    hash bucket and re-merge if a single source outgrows a task), one
    partial-agg groupBy."""
    total = docs_tokens.agg(F.sum(tokens_col).cast("long").alias("_total"))
    w = Window.partitionBy(source_col).orderBy(id_col)
    run = F.sum(tokens_col).over(w).cast("long")
    with_run = (
        docs_tokens.crossJoin(F.broadcast(total))
        .withColumn("_run", run)
        .withColumn("_budget", (F.col("_total") * F.lit(cap_frac)).cast("long"))
    )
    kept = F.col("_run") <= F.col("_budget")
    return with_run.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).cast("long").alias("total_tokens"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("kept_docs"),
        F.sum(F.when(kept, F.col(tokens_col)).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
        F.max("_budget").alias("cap_tokens"),
    )


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Connected components over an (id_a, id_b) edge list by iterative
    min-label propagation: every node's label becomes the min of its own
    and its neighbors', repeated until fixpoint. Returns (id, component)
    with component = min node id of the cluster.

    Each iteration is one groupBy over the (bidirectional) edge relation
    joined to current labels — O(diameter) rounds; near-dup clusters are
    shallow (pairs/triangles), so 2-3 rounds close real corpora. The
    loop's driver traffic is a single converged? count per round, never
    data.

    The edge relation and each round's labels are persisted: the edges
    usually arrive as the WHOLE upstream LSH candidate pipeline
    (shingle → minhash → bands → verified pairs), and without the cache
    every iteration — and every convergence count — re-executes that
    pipeline from the parquet scan up, with lineage (and re-execution
    cost) compounding per round (measured at sf0.1 on the minhash pair
    graph: split_leakage_safe 10.0 s → 7.3 s median / 5.6 s min — the
    remaining floor is the genuine per-round shuffle+action cadence, so
    deeper graphs gain proportionally more). Each round
    unpersists the previous labels; the final labels stay cached for
    the caller's consumption. On a real cluster, swap the per-round
    persist for localCheckpoint at depth to ALSO truncate the logical
    plan if diameters run long.

    This is the canonicalization step after LSH: keep component == id
    rows (one canonical doc per duplicate cluster), drop the rest."""
    sym = edges.selectExpr("id_a AS src", "id_b AS dst").union(
        edges.selectExpr("id_b AS src", "id_a AS dst")
    ).persist()
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    cached = labels  # the persisted handle backing the current labels
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        # Carry the previous label through the update so convergence is
        # a filter over the already-persisted relation instead of a
        # second labels join per round (r12, guide §2.4 — one fewer
        # shuffle per iteration; the propagated labels are identical).
        stepped = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.col("component").alias("prev"),
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        changed = stepped.filter(F.col("component") != F.col("prev")).count()
        cached.unpersist()
        cached = stepped
        # consumers of the returned frame hit stepped's cache through
        # plan matching (the select's subtree IS the persisted plan)
        labels = stepped.select("id", "component")
        if changed == 0:
            break
    sym.unpersist()
    return labels


# PII patterns restricted to the Java-regex ∩ RE2 common dialect (no
# lookaround, explicit character classes, ASCII \b) so the Spark engine
# and a DuckDB oracle replace the exact same spans.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9() \-]{6,}[0-9]",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", patterns: dict[str, str] | None = None
) -> DataFrame:
    """Anonymization pass for training corpora: replace email / IPv4 /
    phone spans with <TYPE> placeholder tokens and count what was
    redacted per doc. Pure map-side regexp_replace chain — JVM-side,
    whole-stage-codegen, no shuffle; the counts let a pipeline alert on
    documents that are mostly PII (drop candidates) instead of silently
    rewriting them.

    Order matters: email before phone (an email's digits must not be
    half-eaten as a phone number), ipv4 before phone (dotted quads
    contain phone-length digit runs). The harness corpus contains no
    digits, so this operator is exercised by the constructed-fixture
    test (tests/test_curation.py) rather than a registered query — a
    corpus-wide all-zeros oracle would pin nothing."""
    pats = patterns or PII_PATTERNS
    out = df
    redacted = F.col(text_col)
    for name, pat in pats.items():
        out = out.withColumn(
            f"n_{name}", F.coalesce(F.regexp_count(text_col, F.lit(pat)), F.lit(0))
        )
    for name, pat in pats.items():
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return out.withColumn("redacted", redacted)


def unigram_logprob_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality score: per-document cross
    entropy under the corpus's own unigram distribution,
    −mean(ln p(token)) in nats, lower = more typical. Filtering the
    high-perplexity tail is the classic LM quality gate (CCNet does it
    with KenLM 5-grams; the unigram model is the same mechanism with a
    weaker LM and zero external dependencies).

    Plan: one explode+groupBy builds the (token, count) model, a
    1-row total, then the token stream joins the model and aggregates
    back per doc — two shuffles, word-count shaped. The token join is
    zipf-skewed by construction (hot tokens dominate); at 100 TB either
    let AQE's skew-join split the hot partitions or broadcast a top-K
    vocabulary with an OOV floor probability — the model table, unlike
    the corpus, is vocabulary-sized.

    Tokens are lowercased whitespace tokens; every scored token is in
    the model by construction (self-scoring), so no smoothing term.
    Scores rounded to 4 — ln() values are irrational, so both engines
    round an ulp-close double; spacing 1e-4 makes a flip ~1e-9 likely,
    the accepted repo-wide rounding posture."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), WHITESPACE_RE),
                lambda w: F.length(w) > 0,
            )
        ).alias("tok"),
    )
    model = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = toks.agg(F.count(F.lit(1)).alias("t"))
    return (
        toks.join(model, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(-F.avg(F.log(F.col("c") / F.col("t"))), 4).alias("xent_nats"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def bigram_logprob_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram-LM quality score: per-document cross entropy under the
    corpus's own bigram distribution, -mean(ln P(w2|w1)) in nats with
    P(w2|w1) = c(w1 w2) / c(w1 .). One LM order up from
    unigram_logprob_score — the next rung on the CCNet/KenLM ladder —
    so repetitive boilerplate (predictable continuations) scores low
    and incoherent token soup scores high even when its unigrams are
    common. Documents with fewer than 2 tokens have no bigrams and are
    excluded (same contract as the oracle).

    Plan: bigrams are formed JVM-side with zip_with over two array
    slices (no positional self-join, no Python); the context counts
    c(w1 .) are aggregated FROM THE MODEL (vocabulary-sized), not by
    rescanning the token stream, so the model costs one groupBy over
    the gram stream plus one over the model. The stream->model join is
    zipf-skewed like the unigram case: at 100 TB let AQE skew-split
    the hot grams or broadcast a top-K gram table with an OOV floor.
    Self-scoring means every gram is in the model — no smoothing term.
    Rounded to 4 dp (repo-wide posture for irrational ln values)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), WHITESPACE_RE),
            lambda w: F.length(w) > 0,
        ).alias("ws"),
    ).filter(F.size("ws") >= 2)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("ws"), 1, F.size("ws") - 1),
                F.slice(F.col("ws"), 2, F.size("ws") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("gram"),
    )
    model = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c2"))
    ctx = model.groupBy(
        F.substring_index("gram", " ", 1).alias("w1")
    ).agg(F.sum("c2").alias("c1"))
    return (
        grams.withColumn("w1", F.substring_index("gram", " ", 1))
        .join(model, "gram")
        .join(ctx, "w1")
        .groupBy("doc_id")
        .agg(
            F.round(-F.avg(F.log(F.col("c2") / F.col("c1"))), 4).alias(
                "xent2_nats"
            ),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def duplicated_ngram_counts(
    df: DataFrame, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document cross-corpus duplicated-n-gram counters (the
    RefinedWeb / Gopher "fraction of n-grams in duplicated n-grams"
    filter, counted over DISTINCT grams): for each doc, how many of its
    distinct word n-grams also appear in at least one OTHER document.
    Complements repetition_signals (intra-doc repeats) and
    boilerplate_ngrams (corpus-global top grams) — this is the per-doc
    score the gate actually thresholds on. Integer outputs (n_grams,
    n_dup_grams); the ratio is the caller's division, keeping the
    oracle hash-exact.

    Scale design: per-doc totals are size(grams) on the map-side array
    — NO explode and no id-keyed shuffle for that half. The exploded
    gram relation is generated twice (doc-frequency aggregate + the
    semi-join left side), a deliberate recompute-over-cache choice: at
    corpus scale the gram relation doesn't fit memory, regeneration is
    a map-side scan, and both consumers partial-aggregate so hot
    boilerplate grams collapse before the gram-keyed shuffles. Docs
    shorter than n words report (0, 0) via the left join, not a
    dropped row."""
    arrays = ngram_arrays(df, id_col, text_col, n)
    totals = arrays.select("id", F.size("grams").alias("n_grams"))
    # explode_outer + isNotNull, NOT explode: plain explode gets an
    # inferred size()>0 filter with the whole gram expression cloned in
    # (InferFiltersFromGenerate), re-tokenizing every row twice.
    grams = arrays.select("id", F.explode_outer("grams").alias("gram")).filter(
        F.col("gram").isNotNull()
    )
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= 2)
        .select("gram")
    )
    dups = (
        grams.join(dup_grams, "gram", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_grams"))
    )
    return (
        totals.join(dups, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_gate(
    df: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stopwords: int = 2,
    min_alpha_word_frac: float = 0.80,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, App. A — public
    thresholds as defaults): per-doc boolean columns for each rule plus
    the conjunctive keep flag.

      ok_word_count      min_words <= n_words <= max_words
      ok_mean_word_len   mean word length in [min, max] chars
      ok_alpha_words     >= 80% of words contain an alphabetic char
      ok_stopwords       >= 2 distinct Gopher stopwords present
      keep               AND of the above

    Pure column math over one tokenize — map-only, no shuffle, no UDF;
    the gate runs at scan speed and composes with the duplicated-ngram
    and repetition thresholds downstream. The token array is referenced
    via size()+aggregate on the SAME alias (CollapseProject trap: a
    once-referenced array inlines and re-evaluates per element). Mean
    word length compares via cross-multiplication (total_chars vs
    bound * n_words) so the oracle never divides — integer compares
    are hash-exact."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WHITESPACE_RE), lambda w: F.length(w) > 0
    )
    t = df.select(F.col(id_col).alias(id_col), toks.alias("_toks"))
    nw = F.size("_toks")
    total_chars = F.aggregate(
        "_toks", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(F.filter("_toks", lambda w: w.rlike("[a-z]")))
    n_stop = F.size(
        F.array_intersect(F.array_distinct("_toks"), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )
    return t.select(
        id_col,
        nw.alias("n_words"),
        (nw.between(min_words, max_words)).alias("ok_word_count"),
        (
            (total_chars >= F.lit(min_mean_word_len) * nw)
            & (total_chars <= F.lit(max_mean_word_len) * nw)
        ).alias("ok_mean_word_len"),
        # round(), not int(): int() floors, so 0.29 → 28 (0.29*100 =
        # 28.999…) would silently loosen the gate for non-default fracs
        (n_alpha * 100 >= F.lit(round(min_alpha_word_frac * 100)) * nw).alias(
            "ok_alpha_words"
        ),
        (n_stop >= min_stopwords).alias("ok_stopwords"),
    ).select(
        id_col,
        "n_words",
        "ok_word_count",
        "ok_mean_word_len",
        "ok_alpha_words",
        "ok_stopwords",
        (
            F.col("ok_word_count")
            & F.col("ok_mean_word_len")
            & F.col("ok_alpha_words")
            & F.col("ok_stopwords")
        ).alias("keep"),
    )


def normalize_url(url):
    """RFC 3986 syntax-based URL normalization as PURE JVM column
    expressions (§6.2.2 case normalization, §6.2.3 scheme-based
    default-port removal and empty-path → '/', §5.2.4 dot-segment
    removal via an F.aggregate push/pop fold — a higher-order function
    that stays inside codegen, no Python anywhere; EMPTY path segments
    are preserved through the fold per §5.2.4, so '/a//b' stays
    '/a//b'), plus the two conventional crawl-dedup extras: query
    parameters sorted and the fragment dropped (the fragment is
    stripped before query extraction, so a '?' inside the fragment is
    never mistaken for a query). Input column (or name) →
    struct(norm_url, host).

    Percent-encoding normalization (§6.2.2.2) applies to the PATH:
    escape hex digits uppercased, escapes of UNRESERVED characters
    (ALPHA / DIGIT / - . _ ~) decoded — %7e → ~, %41 → A — while
    reserved octets stay encoded (%2F remains %2F, uppercased); a
    malformed escape raises via raise_error (the loud gate, kept even
    inside column expressions). Decoding runs BEFORE dot-segment
    removal, so %2E composes into the dot rules per the spec order.

    Supported subset, loudly bounded by construction: absolute http(s)
    URLs with a host (the crawl-ingest case); userinfo is not parsed;
    query escapes pass through (only parameter ORDER is normalized
    there)."""
    from pyspark.sql import functions as F

    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    after = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(after, r"^([^:]*)", 1))
    port = F.regexp_extract(after, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    raw_path0 = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    # §6.2.2.2: '%'-split the path; each tail segment starts with the
    # 2-hex escape code — uppercase it, decode it iff unreserved
    parts = F.split(raw_path0, "%")
    tails = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def fix_escape(s):
        hex2 = F.upper(F.substring(s, 1, 2))
        rest = F.substring(s, 3, 2_000_000)
        ch = F.char(F.conv(hex2, 16, 10).cast("int"))
        decoded = ch.rlike("^[A-Za-z0-9._~-]$")
        good = F.when(decoded, F.concat(ch, rest)).otherwise(
            F.concat(F.lit("%"), hex2, rest)
        )
        return F.when(s.rlike("^[0-9A-Fa-f]{2}"), good).otherwise(
            F.raise_error(F.concat(F.lit("malformed percent-escape in path: %"), s))
        )

    raw_path = F.when(F.size(parts) <= 1, raw_path0).otherwise(
        F.concat(
            F.element_at(parts, 1), F.array_join(F.transform(tails, fix_escape), "")
        )
    )
    # fragment is stripped BEFORE query extraction: a '?' inside the
    # fragment ('http://h/p#a?b=1') is fragment text, not a query
    prefrag = F.substring_index(u, "#", 1)
    query = F.regexp_extract(prefrag, r"\?(.*)", 1)
    # dot-segment removal (RFC 3986 §5.2.4), segment-level: '.' skips,
    # '..' pops (no-op at root), others push — INCLUDING empty segments
    # ('/a//b' keeps its '//' per §5.2.4; only the leading '' produced
    # by the root slash is dropped). A trailing '.'/'..' leaves the
    # normalized path directory-form (trailing slash); a trailing '/'
    # flows through as a pushed empty segment.
    parts2 = F.split(raw_path, "/")
    segs = F.slice(parts2, 2, F.greatest(F.size(parts2) - 1, F.lit(0)))
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(s == "..", F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))))
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    last = F.element_at(segs, -1)
    trailing = (F.size(segs) > 0) & ((last == ".") | (last == ".."))
    norm_path = F.when(F.size(folded) == 0, F.lit("/")).otherwise(
        F.concat(
            F.lit("/"),
            F.array_join(folded, "/"),
            F.when(trailing, F.lit("/")).otherwise(F.lit("")),
        )
    )
    norm_query = F.when(
        query == "", F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(F.sort_array(F.split(query, "&")), "&")))
    norm_url = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        norm_path,
        norm_query,
    )
    return F.struct(norm_url.alias("norm_url"), host.alias("host"))
