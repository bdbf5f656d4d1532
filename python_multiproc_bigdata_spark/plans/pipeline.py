"""Declarative pipeline runner (SURVEY §7 M2) — the Spark-native
replacement for the reference's ThreadedPipeline
(v2/core/pipline.py:41-324).

A Pipeline is `source |> transforms |> sinks`:
  source     — () -> DataFrame  (or a DataFrame)
  transforms — list of DataFrame -> DataFrame (composition ≡ flatMapApply,
               v2/core/commons.py:46-56 — but lazy: Catalyst optimizes the
               whole chain as one plan)
  sinks      — list of DataFrame -> None writers

The reference's queues/process topology (round-robin distribution,
replicate-to-all-loaders fan-out, end-of-stream flags —
pipline.py:92-135) maps to: Spark task scheduling, `persist()` + one
write per sink, and bounded-job completion. Validation mirrors the
reference ctor (>=1 source/sink, pipline.py:75-82).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark import StorageLevel

Transform = Callable[[DataFrame], DataFrame]
Sink = Callable[[DataFrame], None]


class Pipeline:
    def __init__(
        self,
        source: DataFrame | Callable[[], DataFrame],
        transforms: Sequence[Transform] = (),
        sinks: Sequence[Sink] = (),
    ) -> None:
        if source is None:
            raise ValueError("pipeline needs a source")
        if not sinks:
            raise ValueError("pipeline needs at least one sink")
        self.source = source
        self.transforms = list(transforms)
        self.sinks = list(sinks)

    def dataframe(self) -> DataFrame:
        """Compose the lazy plan (no execution)."""
        df = self.source() if callable(self.source) else self.source
        for t in self.transforms:
            df = t(df)
        return df

    def run(self) -> DataFrame:
        """Execute: multi-sink fan-out (L8) = persist once, write N times —
        the scalable form of replicate-to-every-loader-queue
        (pipline.py:127-135). Returns the composed DataFrame (unpersisted
        after the writes complete — re-using it recomputes the chain)."""
        df = self.dataframe()
        if len(self.sinks) > 1:
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            for sink in self.sinks:
                sink(df)
        finally:
            if len(self.sinks) > 1:
                df.unpersist()
        return df
