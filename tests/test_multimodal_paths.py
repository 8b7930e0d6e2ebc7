"""Multimodal plumbing + path-convention tests."""

from __future__ import annotations

import re

import pytest

from salesforce_prefect_etl_pipeline_spark.operators import multimodal
from salesforce_prefect_etl_pipeline_spark.paths import (
    build_paths,
    obj_slug,
    timestamped_raw_path,
)
from salesforce_prefect_etl_pipeline_spark.plans import load_table

from tests.conftest import SF_SMALL


def test_media_adapter_schema(spark):
    media = multimodal.documents_as_media(load_table(spark, SF_SMALL, "documents"))
    dt = dict(media.dtypes)
    assert dt == {
        "media_id": "bigint",
        "modality": "string",
        "mime": "string",
        "payload": "binary",
    }


def test_feature_extraction_batches(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    feats = multimodal.extract_features(multimodal.documents_as_media(docs))
    rows = feats.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r.n_bytes > 0 and len(r.content_md5) == 32
    assert 0.0 <= r.mean_byte <= 255.0
    assert r.n_frames == r.n_bytes // 256


def test_frame_sampling_content(spark):
    """Sampled frame payloads must be the exact byte slices, at the
    exact sampled indices, for every document — recomputed driver-side
    (the SQL oracle can only check multiplicity/lengths)."""
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    media = multimodal.documents_as_media(docs)
    frames = multimodal.sample_frames(media, every_n=4, frame_bytes=256).collect()
    texts = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    expected = {}
    for mid, b in texts.items():
        n_frames = (len(b) + 255) // 256
        for i in range(0, n_frames, 4):
            expected[(mid, i)] = b[i * 256 : (i + 1) * 256]
    got = {(r.media_id, r.frame_idx): bytes(r.frame_payload) for r in frames}
    assert got == expected


def test_resize_stub_shapes(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    media = multimodal.documents_as_media(docs)
    resized = multimodal.resize_media(media, width=8, height=8).collect()
    orig = {r.doc_id: len(r.text.encode("utf-8")) for r in docs.collect()}
    assert len(resized) == 20
    for r in resized:
        assert (r.width, r.height) == (8, 8)
        assert len(bytes(r.payload)) == min(64, orig[r.media_id])
    with pytest.raises(NotImplementedError):
        multimodal.resize_media(media, decode_stub=False)


def test_real_decode_is_explicit_stub(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(1)
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(
            multimodal.documents_as_media(docs), decode_stub=False
        )


def test_paths_conventions(tmp_path):
    p = build_paths(str(tmp_path), "My Object!")
    assert p["root"].endswith("my_object")
    assert p["processed_csv"].endswith("my_object_summary.csv")
    raw = timestamped_raw_path(p["raw_dir"], "My Object!", run_id="abcdef1234")
    assert re.search(r"my_object_\d{8}T\d{6}Z_abcdef12\.csv$", raw)
    assert obj_slug("Opportunity Line-Item") == "opportunity_line_item"
