"""Unit tests for corpus-curation operators on hand-built fixtures —
the harness corpus has no newlines and only shallow dup clusters, so
these cover what the oracle queries can't: multi-hop component chains,
duplicate lines, and crafted n-gram contamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators.curation import (
    connected_components,
    decontaminate_overlap,
    repetition_signals,
)


def test_connected_components_chain_and_singleton_pair(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # separate pair 10-11, disjoint pair 20-21
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (21, 20)], ["id_a", "id_b"]
    )
    got = {(r.id, r.component) for r in connected_components(edges).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20),
    }


def test_repetition_signals_lines_and_grams(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a\nx\nx\n  \nx"),   # dup lines + repeated bigram
            (2, "solo"),                      # 1 token → no bigrams
            (3, ""),                          # empty doc
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    r1 = rows[1]
    # lines: ['a b a b a', 'x', 'x', 'x'] (blank line dropped)
    assert (r1.n_lines, r1.n_dup_lines, r1.max_line_repeats) == (4, 2, 3)
    # tokens: a b a b a x x x → 8 tokens, 3 distinct, 'a' and 'x' 3x each
    assert (r1.n_tokens, r1.n_distinct_tokens, r1.top_token_count) == (8, 3, 3)
    # bigrams: 'a b','b a','a b','b a','a x','x x','x x' → 'a b'/'b a'/'x x' 2x
    assert r1.top_bigram_count == 2
    assert (rows[2].n_tokens, rows[2].top_bigram_count) == (1, 0)
    assert (rows[3].n_tokens, rows[3].n_lines, rows[3].top_token_count) == (0, 0, 0)


def test_decontaminate_overlap_finds_planted_ngram(spark):
    shared = "one two three four five"
    train = spark.createDataFrame(
        [(1, f"prefix {shared} suffix"), (2, "totally different text here")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(100, f"intro {shared} outro")], ["doc_id", "text"])
    got = {
        (r.train_id, r.eval_id, r.n_shared_grams)
        for r in decontaminate_overlap(train, ev, n=5).collect()
    }
    assert got == {(1, 100, 1)}  # exactly the planted 5-gram, doc 2 clean


def test_strip_boilerplate_lines_drops_frequent_preserves_order(spark):
    from python_multiproc_bigdata_spark.operators.curation import (
        strip_boilerplate_lines,
    )

    nav = "HOME | ABOUT | CONTACT"
    lic = "(c) 2026 Example Corp. All rights reserved."
    docs = spark.createDataFrame(
        [
            (1, f"{nav}\nalpha body one\n{lic}"),
            (2, f"{nav}\nbeta body two\nmore beta\n  {lic}  "),  # trimmed match
            (3, f"{nav}\ngamma body three\n{lic}"),
            (4, "delta only unique\nsecond delta line"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.id: (r.text, r.n_lines_dropped)
        for r in strip_boilerplate_lines(docs, min_doc_freq=3).collect()
    }
    assert out[1] == ("alpha body one", 2)
    # surviving lines keep ORIGINAL form and order; trimmed lic matched
    assert out[2] == ("beta body two\nmore beta", 2)
    assert out[3] == ("gamma body three", 2)
    assert out[4] == ("delta only unique\nsecond delta line", 0)
    assert out[5][1] in (0, 1)  # empty doc: the empty line is never "hot"

    plan = (
        strip_boilerplate_lines(docs, min_doc_freq=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the hot-line dictionary reaches documents via broadcast, not shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_boilerplate_ngrams_ranking_deterministic(spark):
    from python_multiproc_bigdata_spark.operators.curation import boilerplate_ngrams

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox sleeps"),
            (3, "the quick brown fox sleeps"),
            (4, "entirely different words here"),
        ],
        ["doc_id", "text"],
    )
    rows = boilerplate_ngrams(docs, n=4, min_doc_freq=2, top_k=10).collect()
    assert rows[0].gram == "the quick brown fox" and rows[0].doc_freq == 3
    assert ("quick brown fox sleeps", 2) in {(r.gram, r.doc_freq) for r in rows}


def test_redact_pii_replaces_spans_and_counts(spark):
    from python_multiproc_bigdata_spark.operators.curation import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.org or bob@sub.host.io today"),
            (2, "server 192.168.0.1 and 10.0.0.255 are up"),
            (3, "call +1 415-555-0199 now"),
            (4, "no pii here at all"),
            (5, "mixed: a@b.co from 127.0.0.1 phone 0044 20 7946 0958"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert out[1].n_email == 2 and "<EMAIL>" in out[1].redacted
    assert "@" not in out[1].redacted.replace("<EMAIL>", "")
    assert out[2].n_ipv4 == 2 and out[2].redacted.count("<IPV4>") == 2
    assert out[3].n_phone == 1 and "<PHONE>" in out[3].redacted
    assert out[4].redacted == "no pii here at all"
    assert (out[4].n_email, out[4].n_ipv4, out[4].n_phone) == (0, 0, 0)
    # email/ip digits are not re-eaten as phones
    assert out[5].n_email == 1 and out[5].n_ipv4 == 1 and out[5].n_phone == 1
    assert out[5].redacted == "mixed: <EMAIL> from <IPV4> phone <PHONE>"


def test_unigram_logprob_orders_rare_docs_last(spark):
    from python_multiproc_bigdata_spark.operators.curation import (
        unigram_logprob_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "the the the the"),          # most typical: hottest token
            (2, "the the rare the"),
            (3, "zebra quux xylo plumb"),    # all singletons: highest xent
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in unigram_logprob_score(docs).collect()}
    assert out[1].n_tokens == 4
    assert out[1].xent_nats < out[2].xent_nats < out[3].xent_nats
    # doc 1: every token is "the", p = 7/12 over the 12-token corpus
    import math

    assert abs(out[1].xent_nats - round(-math.log(7 / 12), 4)) < 1e-9


def test_decontamination_fraction_semantics(spark):
    from python_multiproc_bigdata_spark.operators.curation import (
        decontamination_fraction,
    )

    # n=2 grams; train doc 1 shares 'b c' with eval; doc 2 shares nothing;
    # doc 3 is fully covered by eval; doc 4 too short for any gram
    train = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y z"), (3, "p q"), (4, "solo")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(10, "b c e p q")], "doc_id long, text string")
    out = {
        r.train_id: (r.n_grams, r.n_contaminated, r.contamination_frac, r.flagged)
        for r in decontamination_fraction(train, ev, n=2, flag_threshold=0.5).collect()
    }
    assert out[1] == (3, 1, round(1 / 3, 4), False)
    assert out[2] == (2, 0, 0.0, False)
    assert out[3] == (1, 1, 1.0, True)
    assert 4 not in out  # shorter than n → nothing to leak


def test_cap_source_share_semantics(spark):
    from python_multiproc_bigdata_spark.operators.curation import cap_source_share

    # total = 100 tokens, cap 30% -> budget 30; source a admits docs in
    # id order until the running sum passes 30; source b fits entirely
    toks = spark.createDataFrame(
        [("a", 1, 20), ("a", 2, 10), ("a", 3, 40), ("b", 4, 30)],
        "source string, doc_id long, n_tokens long",
    )
    out = {
        r.source: (r.n_docs, r.total_tokens, r.kept_docs, r.kept_tokens, r.cap_tokens)
        for r in cap_source_share(toks, cap_frac=0.3).collect()
    }
    assert out["a"] == (3, 70, 2, 30, 30)
    assert out["b"] == (1, 30, 1, 30, 30)


def test_split_leakage_safe_invariants(spark):
    """No near-dup cluster may straddle the train/test boundary, and the
    grouped split must agree with the plain hash split for unclustered
    docs."""
    from python_multiproc_bigdata_spark.registry import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["split_leakage_safe"].fn(spark, sf).collect()
    by_group: dict[int, set[str]] = {}
    for r in rows:
        by_group.setdefault(r.group_key, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values())  # no straddling
    # both splits nonempty and ~80/20-ish
    n = len(rows)
    n_train = sum(1 for r in rows if r.split == "train")
    assert 0 < n_train < n
    assert 0.6 < n_train / n < 0.95
    # some docs actually grouped (the fixture has near-dups)
    assert any(r.group_key != r.doc_id for r in rows)


def test_pagerank_star_graph_properties(spark):
    from python_multiproc_bigdata_spark.operators.graph import pagerank

    # symmetrized star: hub h <-> leaves x, y, z
    fwd = [("h", "x"), ("h", "y"), ("h", "z")]
    edges = spark.createDataFrame(
        fwd + [(b, a) for a, b in fwd], "src string, dst string"
    )
    out = pagerank(edges, iterations=3)
    ranks = {r["node"]: r["rank"] for r in out.collect()}
    out.unpersist()
    assert abs(sum(ranks.values()) - 1.0) < 1e-9  # no dangling mass lost
    leaves = [ranks["x"], ranks["y"], ranks["z"]]
    assert max(leaves) - min(leaves) < 1e-12  # symmetry
    assert ranks["h"] > max(leaves)  # hub dominates


def test_bigram_logprob_hand_computed(spark):
    import math

    from python_multiproc_bigdata_spark.operators.curation import (
        bigram_logprob_score,
    )

    # corpus bigrams: "a b" x2 (docs 1,2), "b c" x1 (doc 1)
    # contexts: c("a .")=2, c("b .")=1
    # doc1: -mean(ln(2/2), ln(1/1)) = 0.0 ; doc2: -ln(2/2) = 0.0 ... make
    # it non-trivial: add doc 3 "a d" so P(b|a)=2/3, P(d|a)=1/3
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "A b"), (3, "a d"), (4, "solo"), (5, "")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in bigram_logprob_score(df).collect()}
    # docs 4 (1 token) and 5 (empty) have no bigrams → excluded
    assert set(rows) == {1, 2, 3}
    # doc1: bigrams "a b" (p=2/3), "b c" (p=1/1) → -(ln(2/3)+ln1)/2
    assert rows[1].xent2_nats == round(-(math.log(2 / 3) + 0.0) / 2, 4)
    assert rows[1].n_bigrams == 2
    # doc2 "A b" lowercased → "a b": -ln(2/3)
    assert rows[2].xent2_nats == round(-math.log(2 / 3), 4)
    # doc3 "a d": -ln(1/3) — rarer continuation scores higher
    assert rows[3].xent2_nats == round(-math.log(1 / 3), 4)
    assert rows[3].xent2_nats > rows[2].xent2_nats


def test_weighted_sample_prefers_heavy_docs(spark):
    """training_weighted_sample's key = h/weight race: with a 100:1
    weight ratio the heavy class should dominate the per-lang quota
    (deterministic fixture — md5 keys are fixed). Also pins the
    weight-monotone invariant directly: doubling the weight exactly
    halves the key."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(i, "x", 10 if i % 2 else 1000) for i in range(1, 201)]
    d = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    key = h / F.col("n_chars")
    w = Window.partitionBy("lang").orderBy("key", "doc_id")
    sel = (
        d.select("lang", "doc_id", F.col("n_chars").alias("weight"), key.alias("key"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .collect()
    )
    assert len(sel) == 40
    assert sum(1 for r in sel if r.weight == 1000) == 40
    # doubling weight halves the key, exactly (pure division, no libm)
    half = d.select((h / F.col("n_chars")).alias("k1"), (h / (F.col("n_chars") * 2)).alias("k2")).collect()
    assert all(r.k1 == r.k2 * 2 for r in half)


def test_triangle_count_k4_square_and_chain(spark):
    """K4 has C(3,2)=3 triangles per corner (4 total); a 4-cycle and a
    chain have none. Edge direction/duplication in the input must not
    matter (operator normalizes to undirected distinct)."""
    from python_multiproc_bigdata_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    square = [(10, 11), (11, 12), (12, 13), (13, 10)]
    chain = [(20, 21), (21, 22)]
    dupes = [(2, 1), (1, 2)]  # reversed + duplicate of a K4 edge
    edges = spark.createDataFrame(k4 + square + chain + dupes, ["src", "dst"])
    got = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_basket_rules_planted_cooccurrence(spark, tmp_path):
    """Brands X and Y are planted to ALWAYS co-occur (20 orders), brand
    Z appears in every order (so pairing with Z is uninformative).
    Expect: confidence(X->Y)=1, lift(X,Y)=n/20 (= 2 with n=40), and the
    Z pairs pinned at lift 1.0 (independence)."""
    from python_multiproc_bigdata_spark.registry.curation import (
        basket_association_rules,
    )

    parts = [(1, "X"), (2, "Y"), (3, "Z"), (4, "W")]
    lines = []
    for o in range(1, 21):          # X+Y+Z orders
        lines += [(o, 1), (o, 2), (o, 3)]
    for o in range(21, 41):         # W+Z orders
        lines += [(o, 4), (o, 3)]
    spark.createDataFrame(parts, ["p_partkey", "p_brand"]).write.parquet(
        str(tmp_path / "part.parquet")
    )
    spark.createDataFrame(lines, ["l_orderkey", "l_partkey"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    rows = {(r.brand_a, r.brand_b): r
            for r in basket_association_rules(spark, str(tmp_path)).collect()}
    xy = rows[("X", "Y")]
    assert xy.pair_orders == 20
    assert xy.support == 0.5
    assert xy.confidence == 1.0
    assert xy.lift == 2.0
    assert rows[("X", "Z")].lift == 1.0      # Z is in every order
    assert rows[("W", "Z")].confidence == 1.0
    assert ("X", "W") not in rows            # never co-occur


def test_pii_redact_registered_query_injects_and_scrubs(spark):
    """The registered corpus-wide PII query: injection hits the expected
    doc_id residues and the redacted text retains no raw PII."""
    from python_multiproc_bigdata_spark.registry.curation import curation_pii_redact
    from tests.conftest import SF_DIR

    rows = {r.doc_id: r for r in curation_pii_redact(spark, SF_DIR).collect()}
    for doc_id, r in rows.items():
        assert r.n_email == (1 if doc_id % 7 == 0 else 0), doc_id
        assert r.n_ipv4 == (1 if doc_id % 13 == 0 else 0), doc_id
        assert r.n_phone == (1 if doc_id % 11 == 0 else 0), doc_id


def test_duplicated_ngram_counts_cross_doc(spark):
    # docs 1 and 2 share the trigram "a b c"; doc 3 shares nothing;
    # doc 4 is too short for any trigram (must report 0,0 not vanish)
    df = spark.createDataFrame(
        [
            (1, "a b c d"),      # grams: "a b c", "b c d"
            (2, "z a b c"),      # grams: "z a b", "a b c"
            (3, "p q r s"),      # grams: "p q r", "q r s"
            (4, "x y"),          # no trigrams
        ],
        ["doc_id", "text"],
    )
    from python_multiproc_bigdata_spark.operators.curation import (
        duplicated_ngram_counts,
    )
    got = {
        r.doc_id: (r.n_grams, r.n_dup_grams)
        for r in duplicated_ngram_counts(df, n=3).collect()
    }
    assert got == {1: (2, 1), 2: (2, 1), 3: (2, 0), 4: (0, 0)}


def test_duplicated_ngram_counts_distinct_grams_within_doc(spark):
    # the same gram repeated INSIDE one doc counts once (distinct-gram
    # semantics) and does not make the gram "duplicated" corpus-wide
    df = spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"])
    from python_multiproc_bigdata_spark.operators.curation import (
        duplicated_ngram_counts,
    )
    [r] = duplicated_ngram_counts(df, n=3).collect()
    assert (r.n_grams, r.n_dup_grams) == (2, 0)  # "a b a", "b a b"


def test_gopher_gate_rules(spark):
    from python_multiproc_bigdata_spark.operators.curation import (
        gopher_quality_gate,
    )
    df = spark.createDataFrame(
        [
            # 6 words, mean len ok, all alpha, 2 stopwords -> keep
            (1, "the cat sat with some dog"),
            # word count below min -> rejected on that rule only
            (2, "the dog ran with joy"),
            # stopword rule fails (no gopher stopwords)
            (3, "cat dog bird fish mouse tree"),
            # mean word length too short (single chars)
            (4, "a b c d e f"),
            # alpha fraction fails: >20% pure-digit words
            (5, "the 111 222 333 dog with"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in gopher_quality_gate(df, min_words=6, min_stopwords=2).collect()
    }
    assert rows[1].keep
    assert not rows[2].ok_word_count and rows[2].ok_stopwords
    assert not rows[3].ok_stopwords and rows[3].ok_word_count
    assert not rows[4].ok_mean_word_len
    assert not rows[5].ok_alpha_words and rows[5].ok_stopwords
    assert not rows[2].keep and not rows[3].keep and not rows[4].keep and not rows[5].keep


def test_gopher_gate_alpha_frac_not_floored(spark):
    """Regression (r6 advisory, low): the alpha-word threshold was built
    with int(frac*100), which floors — frac=0.29 became 28 (0.29*100 =
    28.999…) and silently loosened the gate. With round(), a 28/100-alpha
    doc must FAIL at frac=0.29 and a 29/100-alpha doc must pass."""
    from python_multiproc_bigdata_spark.operators.curation import (
        gopher_quality_gate,
    )

    doc = lambda n_alpha: " ".join(["word"] * n_alpha + ["111"] * (100 - n_alpha))
    df = spark.createDataFrame([(1, doc(28)), (2, doc(29))], ["doc_id", "text"])
    rows = {
        r.doc_id: r
        for r in gopher_quality_gate(df, min_alpha_word_frac=0.29).collect()
    }
    assert not rows[1].ok_alpha_words  # floored int() let this pass
    assert rows[2].ok_alpha_words


def test_quality_classifier_learns_above_baseline(spark):
    """The trained LR gate must beat the majority-class baseline on the
    FULL corpus (not just its training sample) — measured 0.94 @ sf0.01
    / 0.92 @ sf0.1 vs 0.52/0.53 baseline; floor 0.80/0.65 budgets
    sample drift at other SFs. Guards the capability actually being a
    classifier: a length-feature design that scored == baseline was
    rejected (operators/classifier.py docstring)."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.operators.classifier import (
        score_quality_lr,
        train_quality_lr_driver,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w, b = train_quality_lr_driver(docs)
    out = score_quality_lr(docs, w, b)
    r = out.agg(
        F.avg(F.col("agree").cast("double")).alias("acc"),
        F.avg(F.col("weak").cast("double")).alias("pos"),
    ).collect()[0]
    baseline = max(r.pos, 1.0 - r.pos)
    assert r.acc >= 0.80, (r.acc, baseline)
    assert r.acc > baseline + 0.05, (r.acc, baseline)


def test_quality_classifier_trainer_is_deterministic(spark):
    """Two trainings from the same frame must produce bit-identical
    weights (the generated-oracle contract depends on it)."""
    from python_multiproc_bigdata_spark.operators.classifier import (
        train_quality_lr_driver,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert train_quality_lr_driver(docs) == train_quality_lr_driver(docs)


def test_corpus_datasheet_invariants(spark):
    """Entropy bounded by ln(#langs in the source), rates in [0,1],
    token totals consistent with doc counts."""
    import math

    from python_multiproc_bigdata_spark.registry.curation import corpus_datasheet

    rows = corpus_datasheet(spark, "/root/testdata/sf0.001").collect()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    langs_per_source = {
        r.source: r.nl
        for r in docs.groupBy("source")
        .agg(F.countDistinct("lang").alias("nl"))
        .collect()
    }
    assert rows
    for r in rows:
        assert 0.0 <= r.quality_pass_rate <= 1.0
        assert 0.0 <= r.exact_dup_rate <= 1.0
        assert -1e-9 <= r.lang_entropy <= math.log(langs_per_source[r.source]) + 1e-6
        assert r.total_tokens >= r.n_docs  # every fixture doc has tokens
        assert abs(r.avg_tokens - r.total_tokens / r.n_docs) < 0.01


def test_domain_reweight_direction_and_normalization(spark):
    """DoReMi direction: weights sum to ~1, and the highest-excess
    source gets weight ABOVE its raw share (upsampled) while the
    lowest-excess source goes below its share."""
    from python_multiproc_bigdata_spark.registry.curation import (
        training_domain_reweight,
    )

    rows = training_domain_reweight(spark, "/root/testdata/sf0.001").collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 0.01
    tot = sum(r.n_bigrams for r in rows)
    hardest = max(rows, key=lambda r: r.excess_nats)
    easiest = min(rows, key=lambda r: r.excess_nats)
    assert hardest.weight > hardest.n_bigrams / tot
    assert easiest.weight < easiest.n_bigrams / tot


def test_line_dedup_drops_shared_boilerplate(spark, tmp_path):
    """Inject a boilerplate footer into 3 synthetic docs: the cleaned
    reconstruction must drop it everywhere (n_dropped >= 1 each) while
    unique lines survive, and a doc of ONLY boilerplate cleans to the
    empty-string hash."""
    import hashlib

    docs = spark.createDataFrame(
        [
            (1, "alpha unique one\nCOPYRIGHT FOOTER\nbeta unique"),
            (2, "gamma unique\nCOPYRIGHT FOOTER\ndelta unique"),
            (3, "COPYRIGHT FOOTER"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from python_multiproc_bigdata_spark.registry.curation import (
        curation_line_dedup,
    )

    rows = {r.doc_id: r for r in curation_line_dedup(spark, str(tmp_path)).collect()}
    assert rows[1].n_dropped == 1 and rows[2].n_dropped == 1
    assert rows[3].n_dropped == 1 and rows[3].n_lines == 1
    assert rows[3].cleaned_md5 == hashlib.md5(b"").hexdigest()
    expected1 = hashlib.md5("alpha unique one\nbeta unique".encode()).hexdigest()
    assert rows[1].cleaned_md5 == expected1


def test_dsir_weights_separate_target_from_offtarget(spark):
    """DSIR sanity: English (target) documents must score a higher mean
    importance log-weight than every non-English slice, and weights must
    be finite for all docs."""
    import math

    from python_multiproc_bigdata_spark.operators.dsir import dsir_log_weights
    from python_multiproc_bigdata_spark.registry.common import prep, table

    d = table(prep(spark), "/root/testdata/sf0.001", "documents")
    out = dsir_log_weights(d, target_lang="en").join(
        d.select("doc_id", "lang"), "doc_id"
    )
    rows = out.collect()
    assert all(math.isfinite(r.dsir_logw) for r in rows)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.dsir_logw)
    means = {k: sum(v) / len(v) for k, v in by_lang.items()}
    for lang, m in means.items():
        if lang != "en":
            assert means["en"] > m, (lang, means)


def test_label_propagation_semantics(spark):
    """Hand-checkable LPA: two cliques joined by one bridge edge form two
    communities after 3 synchronous rounds. Hand trace: clique {1,2,3}
    settles on label 1; clique {10,11,12} settles on label 3 — the
    bridge node's round-1 label (min of 10's neighbors {3,11,12})
    propagates as the second community's id, the classic sync-LPA
    bridge-leak this fixed-round deterministic variant pins exactly."""
    from python_multiproc_bigdata_spark.operators.graph import label_propagation

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(3, 10)]
    und = tri1 + tri2 + bridge
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {r.node: r.label for r in label_propagation(edges, iterations=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 3, 11: 3, 12: 3}


def test_keep_best_per_cluster_picks_longest_member(spark):
    """Every kept doc must be its cluster's longest member (doc_id
    tiebreak), re-derived independently by re-running the components
    pass and taking a driver-side argmax per component."""
    from python_multiproc_bigdata_spark.registry.common import prep, table
    from python_multiproc_bigdata_spark.registry.curation import (
        dedup_keep_best_per_cluster,
        minhash_lsh_pairs,
    )
    from python_multiproc_bigdata_spark.operators.curation import (
        connected_components,
    )

    sf = "/root/testdata/sf0.001"
    got = {r.component: r for r in dedup_keep_best_per_cluster(spark, sf).collect()}
    assert got, "sf0.001 corpus has planted dup clusters"

    d = table(prep(spark), sf, "documents")
    edges = minhash_lsh_pairs(d, threshold=0.8).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    comp = connected_components(edges).select(
        F.col("id").alias("doc_id"), "component"
    )
    members = comp.join(d.select("doc_id", "n_chars"), "doc_id").collect()
    by_comp = {}
    for r in members:
        by_comp.setdefault(r.component, []).append((r.n_chars, r.doc_id))
    assert set(by_comp) == set(got)
    for c, pairs in by_comp.items():
        want_chars, want_doc = max(
            pairs, key=lambda t: (t[0], -t[1])
        )
        assert got[c].n_members == len(pairs)
        assert got[c].keep_doc_id == want_doc, c
        assert got[c].keep_n_chars == want_chars, c


def test_bfs_levels_chain_and_truncation(spark):
    """Hand-traceable BFS: path 1-2-3-4-5-6 plus off-path 2-10 from
    source 1 — levels are hop distances, max_hops truncates, edges act
    undirected (4-5 stored reversed), unreachable 20-21 never appears,
    and a revisit through the 3-10 shortcut does not demote node 10."""
    from python_multiproc_bigdata_spark.operators.graph import bfs_levels

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 4), (5, 6), (2, 10), (3, 10), (20, 21)],
        "src long, dst long",
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.level for r in bfs_levels(edges, src, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 10: 2, 4: 3}


def test_link_prediction_excludes_edges_and_scores_jaccard(spark):
    """sf0.001 invariants: no predicted pair is an existing support-2
    edge, every pair has >= 2 common neighbors, and the top row's
    Jaccard matches a driver-side recomputation from the edge list."""
    from python_multiproc_bigdata_spark.registry.curation import (
        graph_link_prediction,
    )

    sf = "/root/testdata/sf0.001"
    rows = graph_link_prediction(spark, sf).collect()
    assert rows and all(r.cn >= 2 and 0 < r.jaccard <= 1 for r in rows)

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    a = li.selectExpr("l_orderkey ok", "l_partkey src")
    b = li.selectExpr("l_orderkey ok", "l_partkey dst")
    edges = {
        (r.src, r.dst)
        for r in a.join(b, "ok")
        .filter("src < dst")
        .groupBy("src", "dst")
        .count()
        .filter("count >= 2")
        .collect()
    }
    assert not ({(r.a, r.b) for r in rows} & edges)

    nbrs: dict[int, set] = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    for r in rows:
        inter = nbrs[r.a] & nbrs[r.b]
        union = nbrs[r.a] | nbrs[r.b]
        assert len(inter) == r.cn, (r.a, r.b)
        assert abs(r.jaccard - len(inter) / len(union)) < 1e-5, (r.a, r.b)


def test_kcore_peels_hand_graph(spark):
    """k-core on a hand graph: a 4-clique survives k=3 peeling, a
    pendant chain and a triangle hanging off it peel away (the chain in
    round 1, the triangle's attachment making it survive round 1 but
    not after the bridge node's degree drops)."""
    from python_multiproc_bigdata_spark.operators.graph import kcore

    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 10), (10, 11)]
    tri = [(11, 12), (12, 13), (13, 11)]
    edges = spark.createDataFrame(clique + chain + tri, "src long, dst long")
    got = {r.node: r.deg for r in kcore(edges, k=3, rounds=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_markov_stationary_mass_and_dominance(spark):
    """Fixed-point stationary vector at sf0.001: total mass stays near
    1 (floor leak only shrinks it, bounded by rounds × types micro),
    and the stationary ranking follows the long-run inflow structure —
    every type's mass is positive."""
    from python_multiproc_bigdata_spark.registry.events import (
        events_markov_stationary,
    )

    rows = events_markov_stationary(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.stationary for r in rows)
    assert 0.99 <= total <= 1.000001, total
    assert all(r.stationary_micro > 0 for r in rows)
    assert {r.event_type for r in rows} >= {"click", "view"}


def test_badwords_gate_counts_and_verdict(spark):
    """Blocklist semantics: tokens counted with multiplicity, keep ⇔
    zero hits, substrings do NOT match (token-level, not regex)."""
    import python_multiproc_bigdata_spark.registry.curation as cu

    df = spark.createDataFrame(
        [
            (1, "this is clean text"),
            (2, "the slow query was slow and broken"),
            (3, "slowly is not slow-listed as a token either"),
        ],
        "doc_id long, text string",
    )
    orig = cu.table
    cu.table = lambda s, d, n: df if n == "documents" else orig(s, d, n)
    try:
        got = {r.doc_id: r for r in cu.curation_badwords_gate(spark, "unused").collect()}
    finally:
        cu.table = orig
    assert got[1].n_bad == 0 and got[1].keep
    assert got[2].n_bad == 3 and not got[2].keep  # slow×2 + broken
    assert got[3].n_bad == 0 and got[3].keep  # 'slowly'/'slow-listed' ≠ 'slow'


def test_cluster_size_report_mass_conservation(spark):
    """Cluster histogram invariants at sf0.001: docs_bound sums to the
    clustered-doc count, redundant mass = docs_bound − n_clusters per
    size row, and every size ≥ 2 (singletons never enter the edge
    relation)."""
    from python_multiproc_bigdata_spark.registry.curation import (
        dedup_cluster_size_report,
    )

    rows = dedup_cluster_size_report(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r.size >= 2 for r in rows)
    n_docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    )
    for r in rows:
        assert r.docs_bound == r.size * r.n_clusters
        assert (
            abs(r.redundant_share - (r.size - 1) * r.n_clusters / n_docs) < 1e-6
        )


def test_active_learning_selects_boundary_docs(spark):
    """Uncertainty selection invariants at sf0.001: exactly the 50
    smallest margins (verified against the full scored relation), all
    margins ≤ the 50th-smallest overall, deterministic ordering."""
    from python_multiproc_bigdata_spark.operators.classifier import (
        score_quality_lr,
        train_quality_lr_driver,
    )
    from python_multiproc_bigdata_spark.registry.common import prep, table
    from python_multiproc_bigdata_spark.registry.curation import (
        curation_active_learning,
    )

    sf = "/root/testdata/sf0.001"
    got = curation_active_learning(spark, sf).collect()
    assert len(got) == 50
    docs = table(prep(spark), sf, "documents")
    w, b = train_quality_lr_driver(docs)
    allm = sorted(
        (round(abs(r.score - 0.5), 4), r.doc_id)
        for r in score_quality_lr(docs, w, b).collect()
    )
    want = {d for _, d in allm[:50]}
    # tie at the boundary margin can permute membership only among
    # equal-margin docs; with the doc_id tiebreak the sets are equal
    assert {r.doc_id for r in got} == want
    assert max(r.margin for r in got) == allm[49][0]


def test_url_normalize_rules_and_jvm_only(spark):
    """RFC 3986 normalization hand cases (each rule isolated) and the
    plan claim: normalize_url is column expressions + an aggregate HOF
    — no Python evaluation stage anywhere."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.operators.curation import normalize_url

    cases = [
        # (input, expected norm_url, expected host)
        ("HTTP://WWW.X.COM:80/a/b", "http://www.x.com/a/b", "www.x.com"),
        ("https://x.com:443/", "https://x.com/", "x.com"),
        ("http://x.com:443/p", "http://x.com:443/p", "x.com"),  # non-default kept
        ("https://x.com:8080", "https://x.com:8080/", "x.com"),
        ("http://x.com/a/./b", "http://x.com/a/b", "x.com"),
        ("http://x.com/a/b/../c", "http://x.com/a/c", "x.com"),
        ("http://x.com/a/..", "http://x.com/", "x.com"),
        ("http://x.com/a/../../..", "http://x.com/", "x.com"),
        ("http://x.com/x/./../y/.", "http://x.com/y/", "x.com"),
        ("http://x.com/p?b=2&a=1#frag", "http://x.com/p?a=1&b=2", "x.com"),
        ("http://x.com?z=1", "http://x.com/?z=1", "x.com"),
        # §6.2.2.2 percent-encoding: unreserved decoded, reserved kept
        # (hex uppercased), %2E composes into dot-segment removal
        ("http://x.com/%7euser/%41b", "http://x.com/~user/Ab", "x.com"),
        ("http://x.com/a%2fb", "http://x.com/a%2Fb", "x.com"),
        ("http://x.com/a/%2E%2E/c", "http://x.com/c", "x.com"),
        # §5.2.4 preserves EMPTY segments: '//' is not collapsed
        ("http://x.com/a//b", "http://x.com/a//b", "x.com"),
        ("http://x.com//a", "http://x.com//a", "x.com"),
        ("http://x.com/a//", "http://x.com/a//", "x.com"),
        ("http://x.com/a//../b", "http://x.com/a/b", "x.com"),
        ("http://x.com/a//.", "http://x.com/a//", "x.com"),
        # a '?' inside the fragment is fragment text, not a query
        ("http://x.com/p#a?b=1", "http://x.com/p", "x.com"),
        ("http://x.com/p?b=2&a=1#a?z=9", "http://x.com/p?a=1&b=2", "x.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], ["url"])
    out = df.select("url", normalize_url("url").alias("n")).collect()
    got = {r.url: (r.n.norm_url, r.n.host) for r in out}
    for u, want_url, want_host in cases:
        assert got[u] == (want_url, want_host), (u, got[u])
    plan = (
        df.select(normalize_url("url").alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan, plan
    # malformed escape: the loud gate holds even inside column exprs
    bad = spark.createDataFrame([("http://x.com/a%zzb",)], ["url"])
    import pytest as _pytest

    with _pytest.raises(Exception, match="malformed percent-escape"):
        bad.select(normalize_url("url").alias("n")).collect()
