"""Multimodal plumbing: frame sampling + resize planning
(operators/multimodal.sample_frames_and_resize) — exact row explosion,
stride dedup, and integer resize math vs a pure-Python reference."""

from __future__ import annotations

import hashlib

from crawler_spark.operators.multimodal import (
    attach_fake_media,
    extract_media_features,
    sample_frames_and_resize,
)


def _feats(spark, refs):
    docs = spark.createDataFrame(
        [(str(i), r) for i, r in enumerate(refs)],
        "doc_id string, media_ref string",
    )
    return extract_media_features(attach_fake_media(docs))


def test_frame_sampling_stride_and_dedup(spark):
    feats = _feats(spark, [f"site/{i}.jpg" for i in range(30)])
    meta = {r["doc_id"]: r.asDict() for r in feats.collect()}
    rows = sample_frames_and_resize(feats, k=2, target=224).collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, m in meta.items():
        n = m["n_frames"]
        want_idxs = sorted({(j * n) // 2 for j in range(2)})
        got = sorted(by_doc[doc_id], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == want_idxs
        # 1-frame media yield exactly one row (stride indices collapse)
        if n == 1:
            assert len(got) == 1
        mx = max(m["width"], m["height"])
        for r in got:
            assert r["out_width"] == (m["width"] * 224) // mx
            assert r["out_height"] == (m["height"] * 224) // mx
            assert max(r["out_width"], r["out_height"]) == 224
            assert r["frame_sha256"] == hashlib.sha256(
                f"{m['content_sha256']}:{r['frame_idx']}".encode()
            ).hexdigest()


def test_frame_rows_explode_count(spark):
    feats = _feats(spark, [f"a/{i}.png" for i in range(50)])
    n_meta = {r["doc_id"]: r["n_frames"] for r in feats.collect()}
    total = sample_frames_and_resize(feats, k=2).count()
    assert total == sum(1 if n == 1 else 2 for n in n_meta.values())
