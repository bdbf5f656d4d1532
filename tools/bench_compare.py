"""Diff two bench artifacts: per-query timings side-by-side with deltas,
three-way classified as faster / slower / config-changed (a deliberate
quality tradeoff recorded in the artifact's `config_changed` list — e.g.
r4's ivf_kmeans 8->128-list recall bump — is NOT a regression and is
reported separately). Works with the old min-of-2 format (flat seconds),
the r4 median format, and the r5+ compact format whose `queries` map is
the `{"_full": "BENCH_FULL.json"}` pointer (resolved relative to the
artifact's directory).

Usage: python tools/bench_compare.py BENCH_r04.json BENCH_FULL.json [pct]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

# Absolute-seconds floor under which a per-query delta is noise, measured
# in r6 on byte-identical code (see bench.py:run_one docstring).
NOISE_ABS_SEC = 1.0

# The reference flagship (words-ETL spine): exempt from noise-band
# muting — see the signal computation below.
FLAGSHIP = {"words_pipeline", "words_total_tokens"}


def load(path: str) -> tuple[dict[str, float], set[str]]:
    with open(path) as f:
        doc = json.load(f)
    parsed = doc.get("parsed") or doc
    queries = parsed.get("queries", {})
    pointer = parsed.get("queries_full_artifact") or queries.get("_full")
    if pointer and not any(
        isinstance(v, (int, float)) for v in queries.values()
    ):  # r5+ compact line: follow the pointer to the full map
        full_path = Path(path).resolve().parent / pointer
        with open(full_path) as f:
            parsed = json.load(f)
        queries = parsed.get("queries", {})
    return queries, set(parsed.get("config_changed", []))


def main() -> int:
    a_path, b_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    a, cc_a = load(a_path)
    b, cc_b = load(b_path)
    config_changed = cc_a | cc_b
    shared = sorted(set(a) & set(b))
    faster, slower, tradeoff = [], [], []
    print(f"{'query':36s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    noise = []
    for q in shared:
        if a[q] <= 0:
            continue
        pct = (b[q] - a[q]) / a[q] * 100
        # r6 measured the per-query noise band on byte-identical code:
        # ±~30% relative / up to ~1 s absolute on 3-repeat medians
        # (dedup_containment +29%, zero diff). A delta is SIGNAL only if
        # it clears the pct threshold AND moves >= NOISE_ABS_SEC; inside
        # the band it is annotated, never classified as a regression.
        # Exception: an EXTREME relative move (>= 3x the threshold,
        # e.g. 0.2 s -> 0.9 s = +350%) is signal even below the
        # absolute floor — the floor was calibrated on multi-second
        # queries and must not mute the ~100 sub-second ones. A 0.1 s
        # sub-floor still applies so millisecond jitter can't flag.
        abs_delta = abs(b[q] - a[q])
        signal = (abs_delta >= NOISE_ABS_SEC and abs(pct) >= thresh) or (
            abs_delta >= 0.1 and abs(pct) >= 3 * thresh
        )
        # The reference's flagship pair gets NO noise-band muting: the
        # repo's headline claim is the words-ETL rate, so any move
        # >= threshold and >= 0.1 s on these is reported as signal
        # (VERDICT r8 ask #5 — the r7→r8 +0.4-0.6 s drift on ~1.1 s
        # medians was classified as noise and went uninvestigated).
        if q in FLAGSHIP:
            signal = abs_delta >= 0.1 and abs(pct) >= thresh
        in_noise_band = not signal
        mark = ""
        if q in config_changed:
            mark = " [config-changed]"
            if abs(pct) >= thresh:
                tradeoff.append(q)
        elif in_noise_band:
            if abs(pct) >= thresh:
                mark = " [within noise band]"
                noise.append(q)
        elif pct < 0:
            mark = " <-- faster"
            faster.append(q)
        else:
            mark = " <-- SLOWER"
            slower.append(q)
        print(f"{q:36s} {a[q]:8.3f} {b[q]:8.3f} {pct:+7.1f}%{mark}")
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    ta, tb = sum(a[q] for q in shared), sum(b[q] for q in shared)
    if ta > 0:
        print(f"\nshared total: {ta:.1f}s -> {tb:.1f}s "
              f"({(tb - ta) / ta * 100:+.1f}%)")
        print(f"moved >={thresh:.0f}% and >={NOISE_ABS_SEC:.1f}s: "
              f"{len(faster)} faster, "
              f"{len(slower)} slower (regressions), "
              f"{len(tradeoff)} config-changed (deliberate tradeoffs), "
              f"{len(noise)} within the measured noise band")
        if noise:
            print(f"noise-band (not signal): {', '.join(noise)}")
        if slower:
            print(f"regressions: {', '.join(slower)}")
        if tradeoff:
            print(f"tradeoffs: {', '.join(tradeoff)}")
    else:
        print("\nno overlapping timed queries between the two artifacts")
    if only_a:
        print(f"only in {a_path}: {', '.join(only_a)}")
    if only_b:
        print(f"only in {b_path}: {', '.join(only_b)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
