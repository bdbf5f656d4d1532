"""General user-defined aggregation surface (SURVEY §2.7: the reference's
"UDFs" are arbitrary Python callables plugged into transformer/reducer
slots — aggregators.py:19, text.py:12-14). Spark-first policy: built-ins
whenever one exists (every callable the reference actually uses has one,
SURVEY §2.6); this module is the escape hatch for genuinely custom logic.

`grouped_apply` is the A1 general-reducer contract: an arbitrary
pandas-level fold per key, Arrow-batched (never row-at-a-time Python).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def grouped_apply(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """applyInPandas wrapper: `fn` receives each key group as a pandas
    DataFrame and returns its reduced frame. The reference's
    ReduceItemTransformer groups are per-file (bounded), which is exactly
    the regime where per-group pandas is safe; for unbounded groups use an
    algebraic built-in instead."""
    return df.groupBy(*list(keys)).applyInPandas(fn, schema=schema)


def median_by_group(
    df: DataFrame, keys: Sequence[str], value_col: str, out_col: str = "median"
) -> DataFrame:
    """Exact per-group median via the pandas path — an aggregation with no
    single-pass algebraic form, i.e. the case the general-reducer surface
    exists for. (Interpolating median: mean of the two middle order
    statistics for even counts — matches DuckDB/NumPy.)"""
    key_list = list(keys)

    def reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {k: [pdf[k].iloc[0]] for k in key_list}
        out[out_col] = [round(float(pdf[value_col].median()), 4)]
        out["n"] = [len(pdf)]
        return pd.DataFrame(out)

    key_schema = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in key_list
    )
    return grouped_apply(
        df, key_list, reduce, schema=f"{key_schema}, {out_col} double, n long"
    )


def char_ngrams_udtf():
    """A real Python UDTF (Spark 4 table function): one input string →
    N rows of (pos, ngram) character trigrams. Completes the
    UDF/UDAF/UDTF trio the reference's callable slots imply — the
    tokenizers' explode(regexp_extract_all(...)) stays the FAST path
    (JVM-side); a UDTF is the generality escape hatch for table
    functions no expression composition can write. Arrow-optimized
    (useArrow) so rows batch across the Python boundary.

    Returns the registrable class; use:
        spark.udtf.register("char_ngrams", char_ngrams_udtf())
        spark.sql("SELECT t.* FROM docs, LATERAL char_ngrams(text) t")
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string", useArrow=True)
    class CharNgrams:
        def eval(self, text: str):
            if text is None:
                return
            for i in range(max(0, len(text) - 2)):
                yield i, text[i : i + 3]

    return CharNgrams


def ewma_per_key(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    value: str,
    alpha: float = 0.1,
    out_schema: str | None = None,
) -> DataFrame:
    """Per-key exponentially weighted moving average — the classic
    inherently-sequential recurrence s_i = a*x_i + (1-a)*s_{i-1}
    (s_1 = x_1) that no window frame expresses (each output depends on
    the FULL prefix through a product chain, not an algebraic
    aggregate). The per-key fold runs in pandas via grouped_apply;
    keys fold in parallel, Arrow moves only (key, order, value).

    Determinism/oracle note: the fold's float ops are evaluated in the
    exact textbook order on float64, so an engine replaying the same
    recurrence (e.g. a recursive CTE) reproduces the bits exactly — no
    rounding needed. At 100 TB the group payload is the per-key event
    history (bounded by per-entity activity, like every sessionization
    window here); a hot key folds alone but never broadcasts.

    Returns (key, *order, rn, ewma)."""
    cols = [key, *order, value]
    ocols = list(order)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ocols)
        out_s = []
        s = None
        for x in pdf[value]:
            s = float(x) if s is None else alpha * float(x) + (1.0 - alpha) * s
            out_s.append(s)
        res = pdf[[key, *ocols]].copy()
        res["rn"] = range(1, len(res) + 1)
        res["ewma"] = out_s
        return res

    schema = out_schema or (
        f"{key} long, " + ", ".join(f"{c} long" for c in ocols) + ", rn long, ewma double"
    )
    return grouped_apply(df.select(*cols), [key], fold, schema)


def holt_forecast_per_key(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    value: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
) -> DataFrame:
    """Per-key Holt double-exponential smoothing (additive linear
    trend) — the EWMA's forecasting sibling and, like it, an inherently
    sequential recurrence (level and trend each depend on the full
    prefix):

        l_1 = y_1,  b_1 = 0
        l_i = a*y_i + (1-a)*(l_{i-1} + b_{i-1})
        b_i = B*(l_i - l_{i-1}) + (1-B)*b_{i-1}

    Returns ONE row per key: (key, n_points, level, trend,
    f1..f{horizon}) with f_h = l_n + h*b_n — the h-step-ahead linear
    forecast. Float ops run in the exact textbook order on float64, so
    a recursive-CTE replay reproduces the bits exactly (the
    ewma_per_key determinism doctrine — no rounding anywhere).

    Scale: series fold in parallel per key via applyInPandas; each
    group's payload is its (order, value) history — per-entity-bounded,
    same as every sessionization window here."""
    one_a = 1.0 - alpha
    one_b = 1.0 - beta
    ocols = list(order)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ocols)
        l = b = None
        for y in pdf[value]:
            y = float(y)
            if l is None:
                l, b = y, 0.0
            else:
                new_l = alpha * y + one_a * (l + b)
                b = beta * (new_l - l) + one_b * b
                l = new_l
        row = {key: [pdf[key].iloc[0]], "n_points": [len(pdf)],
               "level": [l], "trend": [b]}
        for h in range(1, horizon + 1):
            row[f"f{h}"] = [l + h * b]
        return pd.DataFrame(row)

    fcols = ", ".join(f"f{h} double" for h in range(1, horizon + 1))
    schema = f"{key} string, n_points long, level double, trend double, {fcols}"
    return grouped_apply(df.select(key, *ocols, value), [key], fold, schema)
