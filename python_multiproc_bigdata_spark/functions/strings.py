"""String/path scalar functions (SURVEY §2.6 X1–X3, X7).

Reference semantics (cited per function) re-expressed as built-in column
expressions so they run inside whole-stage codegen — the reference applied
these as per-row Python callables inside transformer chains.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def truncate_str(col: Column | str, limit: int = 255) -> Column:
    """X1: keep the first ``limit - 1`` characters, null-safe.

    Mirrors the reference's off-by-one: ``truncate_str_255`` keeps 254 chars
    (``txt[0:min(254, len(txt))]``, reference v2/core/commons.py:163-167),
    and ``truncate_str_270`` keeps 269.
    """
    return F.substring(F.col(col) if isinstance(col, str) else col, 1, limit - 1)


def len_gt(col: Column | str, limit: int = 255) -> Column:
    """X2: boolean ``length(txt) > limit`` with null passthrough
    (reference v2/core/commons.py:169-173)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) > F.lit(limit)


def basename_backwards(col: Column | str, k: int = 5) -> Column:
    """X3: keep the last ``max(2, k)`` non-empty path segments of a
    ``/``-separated path, rejoined (reference v2/core/commons.py:138-161;
    ``_x4`` keeps 5).

    The reference walks basename/dirname: on an absolute path the walk
    reaches ``/`` and appends EMPTY basenames, which then vanish in
    ``os.path.join`` — so ``/a/b/file.txt`` with k=5 yields
    ``a/b/file.txt`` (leading slash consumed), and in general the result
    is the trailing ``min(max(2,k), n)`` non-empty segments with no
    leading slash. Filtering empty segments reproduces that, including
    the duplicate-``//`` case (dirname normalizes them away). Known
    divergences, accepted for path data from a corpus walker: trailing
    ``/`` (reference keeps a trailing slash) and ``.``/``..`` prefixes
    (reference breaks the walk early) — neither occurs in walker output.
    """
    c = F.col(col) if isinstance(col, str) else col
    kk = max(2, k)  # reference clamps backwards_level to >= 2
    parts = F.filter(F.split(c, "/"), lambda p: p != "")
    n = F.size(parts)
    # slice(start=-kk) errors when |start| > size, so clamp to the full array.
    return F.when(n <= kk, F.concat_ws("/", parts)).otherwise(
        F.concat_ws("/", F.slice(parts, -kk, kk))
    )


def format_result(word: Column | str, count: Column | str, file: Column | str) -> Column:
    """X7: the beam variant's ``'%s; %s; %s' % (word, count, file)``
    (reference py-beam/main.py:99-102)."""
    return F.format_string(
        "%s; %s; %s",
        F.col(word) if isinstance(word, str) else word,
        F.col(count) if isinstance(count, str) else count,
        F.col(file) if isinstance(file, str) else file,
    )
