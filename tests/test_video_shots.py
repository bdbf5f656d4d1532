"""Video shot-boundary tests (operators/multimodal.py avi-shots family,
r10): the scene-structured synth must put cuts exactly at scene-length
multiples, the decoded-pixel distances must equal the closed form, and
the stdlib-independent container framing must stay parseable by the
real AVI walker."""

from __future__ import annotations

from python_multiproc_bigdata_spark.operators.multimodal import (
    SHOT_SCENE_LEN,
    attach_avi_shots,
    avi_frames,
    avi_shot_transitions,
    synth_avi_shots,
)


def test_shot_corpus_closed_form():
    """Decoded-pixel circular distances equal the closed form the SQL
    oracle states: 3·cells inside a scene, 88·cells at a cut; the
    boundary flag fires exactly at scene-length multiples."""
    import numpy as np

    for d in range(24):
        w, h, frames = avi_frames(synth_avi_shots(d))
        assert (w, h) == (4 + d % 3, 3 + d % 2)
        assert len(frames) == 8 + d % 5
        cells = w * h * 3
        for f in range(1, len(frames)):
            delta = np.abs(frames[f].astype(np.int64) - frames[f - 1].astype(np.int64))
            dist = int(np.minimum(delta, 256 - delta).sum())
            want = (88 if f % SHOT_SCENE_LEN == 0 else 3) * cells
            assert dist == want, (d, f, dist, want)


def test_shot_transitions_distributed(spark):
    rows = avi_shot_transitions(
        attach_avi_shots(spark.createDataFrame([(d,) for d in range(30)], ["doc_id"]))
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(30):
        trs = sorted(by_doc[d], key=lambda r: r.frame_idx)
        nf = 8 + d % 5
        assert [r.frame_idx for r in trs] == list(range(1, nf))
        for r in trs:
            assert r.is_boundary == (r.frame_idx % SHOT_SCENE_LEN == 0), r
