"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling") over
hashed n-gram features.

Beyond-reference capability: given a TARGET domain (here the `lang =
'en'` slice, standing in for "looks like the pretraining target") and
the RAW corpus, fit two hashed bag-of-token models and score every raw
document with the importance log-weight

    log w(d) = Σ_tokens [ ln p_target(bucket) − ln p_raw(bucket) ]

DSIR then resamples the raw corpus proportionally to w — documents
distributionally close to the target float up. This module computes the
log-weights; the resampling step is the already-registered weighted
sampler's job.

Determinism: the feature hash is the classifier's (16·d1 + d2) % 256
md5-hex arithmetic (portable to DuckDB via strpos — no CONV()), the
models are integer token counts with add-one smoothing, and the final
log-weight is rounded to 4dp — the only cross-engine float risk is
ln()'s last ulp across a few hundred summed terms (≪ the 4dp grain).

Scale (100 TB): one tokenize+hash pass feeds BOTH model building (a
256-row groupBy — algebraic, map-side combinable) and scoring (a
256-row broadcast join + one groupBy(doc_id)). The model table is tiny
by construction (n_buckets rows regardless of corpus size); nothing
driver-side but the two scalar totals. A production run would persist
the token relation to scan once instead of twice; at sf0.1 the double
scan is cheaper than the cache write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.text import WHITESPACE_RE

N_BUCKETS = 256


def _bucketed_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket) — one row per token, bucket = hashed token
    id in [0, N_BUCKETS) via the portable md5-hex arithmetic."""
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), WHITESPACE_RE)).alias("token"),
    ).filter(F.length("token") > 0)
    d1 = F.expr("instr('0123456789abcdef', substring(md5(token), 1, 1)) - 1")
    d2 = F.expr("instr('0123456789abcdef', substring(md5(token), 2, 1)) - 1")
    return toks.select(
        "doc_id",
        "lang",
        ((F.lit(16) * d1 + d2) % N_BUCKETS).cast("int").alias("bucket"),
    )


def dsir_log_weights(docs: DataFrame, target_lang: str = "en") -> DataFrame:
    """Per-document DSIR importance log-weight of the raw corpus against
    the `target_lang` slice. Output: (doc_id, n_tokens, dsir_logw).

    Documents with zero tokens have no defined weight and are omitted
    (identically on both engines — the token relation defines the
    population)."""
    tok = _bucketed_tokens(docs)
    model = tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("lang") == target_lang, 1).otherwise(0)).alias("ct"),
    )
    tot = model.agg(F.sum("cr").alias("tcr"), F.sum("ct").alias("tct"))
    lw = (
        model.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.log((F.col("ct") + F.lit(1.0)) / (F.col("tct") + N_BUCKETS))
                - F.log((F.col("cr") + F.lit(1.0)) / (F.col("tcr") + N_BUCKETS))
            ).alias("lwb"),
        )
    )
    return (
        tok.join(F.broadcast(lw), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lwb"), 4).alias("dsir_logw"),
        )
    )
