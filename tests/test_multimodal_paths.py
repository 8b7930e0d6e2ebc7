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
    # real-decode path on a non-image payload fails loudly at the
    # decoder dispatch (text bytes are not BMP/PPM)
    with pytest.raises(Exception, match="unsupported image format|not a BMP"):
        multimodal.resize_media(media, decode_stub=False).collect()


def test_real_decode_rejects_non_image_payloads(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(1)
    with pytest.raises(Exception, match="unsupported image format"):
        multimodal.extract_features(
            multimodal.documents_as_media(docs), decode_stub=False
        ).collect()


def test_paths_conventions(tmp_path):
    p = build_paths(str(tmp_path), "My Object!")
    assert p["root"].endswith("my_object")
    assert p["processed_csv"].endswith("my_object_summary.csv")
    raw = timestamped_raw_path(p["raw_dir"], "My Object!", run_id="abcdef1234")
    assert re.search(r"my_object_\d{8}T\d{6}Z_abcdef12\.csv$", raw)
    assert obj_slug("Opportunity Line-Item") == "opportunity_line_item"


def test_bmp_roundtrip_and_decode_stats(spark):
    from salesforce_prefect_etl_pipeline_spark.operators import multimodal as M

    # 3x2 image with known bytes; row padding exercised (3*3=9 -> pad to 12)
    px = bytes(range(3 * 3 * 2))
    bmp = M.encode_bmp(3, 2, px)
    w, h, n, mean = M.decode_image(bmp)
    assert (w, h, n) == (3, 2, 18)
    assert mean == sum(px) / len(px)
    # full pixel roundtrip (top-down row order restored from bottom-up file)
    w2, h2, decoded = M._decode_bmp_pixels(bmp)
    assert (w2, h2) == (3, 2) and decoded == px


def test_ppm_decode_with_comments():
    from salesforce_prefect_etl_pipeline_spark.operators import multimodal as M

    data = bytes(range(3 * 2 * 1))
    ppm = b"P6\n# a comment\n2 1\n# another\n255\n" + data
    w, h, n, mean = M.decode_image(ppm)
    assert (w, h, n) == (2, 1, 6)
    assert mean == sum(data) / 6


def test_decode_rejects_unknown_format():
    from salesforce_prefect_etl_pipeline_spark.operators import multimodal as M

    with pytest.raises(ValueError, match="unsupported image format"):
        M.decode_image(b"\x89PNG\r\n")


def test_real_extract_features_and_resize(spark):
    from salesforce_prefect_etl_pipeline_spark.operators import multimodal as M

    docs = spark.createDataFrame([(1, "x"), (22, "y")], ["doc_id", "text"])
    media = M.synthetic_bmp_media(docs, width=16, height=16)
    feats = {r.media_id: r for r in M.extract_features(media, decode_stub=False).collect()}
    for mid in (1, 22):
        expected = sum((mid * 31 + i) % 256 for i in range(768)) / 768
        assert feats[mid].mean_byte == expected  # decoded pixels, not raw file bytes
        assert feats[mid].n_frames == 1

    small = M.resize_media(media, width=4, height=4, decode_stub=False).collect()
    for r in small:
        w, h, n, _ = M.decode_image(bytes(r.payload))
        assert (w, h, n) == (4, 4, 48)  # re-encoded BMP at target dims
        # nearest-neighbor: every output pixel exists in the source image
        _, _, src = M._decode_bmp_pixels(
            M.encode_bmp(16, 16, bytes((r.media_id * 31 + i) % 256 for i in range(768)))
        )
        _, _, out_px = M._decode_bmp_pixels(bytes(r.payload))
        src_pixels = {src[i : i + 3] for i in range(0, len(src), 3)}
        assert all(out_px[i : i + 3] in src_pixels for i in range(0, len(out_px), 3))


def test_decode_rejects_malformed_payloads():
    """Truncated or nonsense headers must raise, never return silently
    wrong statistics from short slices."""
    good = multimodal.encode_bmp(4, 4, bytes(range(48)))
    w, h, n, mean = multimodal.decode_image(good)
    assert (w, h, n) == (4, 4, 48)
    # truncate the pixel array
    with pytest.raises(ValueError, match="truncated BMP"):
        multimodal.decode_image(good[: len(good) - 8])
    # corrupt the width to a non-positive value
    bad_width = bytearray(good)
    bad_width[18:22] = (0).to_bytes(4, "little")
    with pytest.raises(ValueError, match="malformed BMP"):
        multimodal.decode_image(bytes(bad_width))
    # PPM with fewer data bytes than the header promises
    with pytest.raises(ValueError, match="malformed PPM"):
        multimodal.decode_image(b"P6 4 4 255\n" + b"\x00" * 10)


def test_decode_jpeg_png_via_pil_when_available():
    """JPEG/PNG go through the optional PIL slot; without Pillow the
    error message must say how to enable it."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    img = Image.new("RGB", (8, 8), color=(10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    w, h, n, mean = multimodal.decode_image(buf.getvalue())
    assert (w, h, n) == (8, 8, 192)
    assert mean == pytest.approx((10 + 20 + 30) / 3)


def test_decode_unknown_format_message_mentions_pillow():
    try:
        multimodal.decode_image(b"\x89PNG\r\n\x1a\nnot-a-real-png")
    except ValueError as exc:
        # without Pillow: install hint; with Pillow: decode failure
        assert "Pillow" in str(exc) or "PIL" in str(exc)
    else:  # pragma: no cover - only reachable with Pillow + valid PNG
        pytest.fail("expected ValueError")


def test_wav_roundtrip_and_audio_stats(spark):
    """encode_wav -> decode_audio roundtrip reproduces the synthetic
    sample formula exactly; the Spark decode query matches a driver-side
    recomputation on a small slice."""
    import numpy as np

    m = 7
    i = np.arange(256, dtype=np.int64)
    samples = ((m * 31 + i) % 4096) - 2048
    rate, n, mean_abs, zc = multimodal.decode_audio(
        multimodal.encode_wav(8000, samples)
    )
    assert (rate, n) == (8000, 256)
    assert mean_abs == float(np.abs(samples).sum()) / 256
    assert zc == int(np.count_nonzero(samples[:-1] * samples[1:] < 0))

    docs = load_table(spark, SF_SMALL, "documents").limit(5)
    rows = multimodal.decode_audio_stats(
        multimodal.synthetic_wav_media(docs)
    ).collect()
    assert len(rows) == 5
    for r in rows:
        s = ((r.media_id * 31 + i) % 4096) - 2048
        assert r.n_samples == 256 and r.sample_rate == 8000
        assert r.mean_abs_sample == float(np.abs(s).sum()) / 256
        assert r.n_zero_cross == int(np.count_nonzero(s[:-1] * s[1:] < 0))


def test_decode_audio_rejects_malformed_payloads():
    import numpy as np

    import pytest as _pytest

    good = multimodal.encode_wav(8000, np.zeros(4, dtype=np.int64))
    with _pytest.raises(ValueError, match="RIFF"):
        multimodal.decode_audio(b"not audio at all")
    with _pytest.raises(ValueError, match="missing fmt/data"):
        multimodal.decode_audio(good[:12])
    # stereo stream: flip the channel count in the fmt chunk
    stereo = bytearray(good)
    stereo[22:24] = (2).to_bytes(2, "little")
    with _pytest.raises(ValueError, match="PCM16 mono"):
        multimodal.decode_audio(bytes(stereo))


def test_ahash_detects_planted_near_dup_images(spark):
    """Perceptual-hash contract: an exact duplicate image pairs at
    Hamming 0, a one-pixel edit stays a near-dup, a structurally
    different image does not pair; non-divisible dimensions raise."""
    base = bytes((7 * i) % 256 for i in range(3 * 16 * 16))
    tweaked = bytearray(base)
    tweaked[100] = (tweaked[100] + 128) % 256  # one channel byte edited
    inverted = bytes(255 - b for b in base)
    rows = [
        (1, "image", "image/bmp", multimodal.encode_bmp(16, 16, base)),
        (2, "image", "image/bmp", multimodal.encode_bmp(16, 16, base)),
        (3, "image", "image/bmp", multimodal.encode_bmp(16, 16, bytes(tweaked))),
        (4, "image", "image/bmp", multimodal.encode_bmp(16, 16, inverted)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    pairs = {
        (r.ma, r.mb): r.hamming
        for r in multimodal.ahash_near_dup_pairs(media, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs

    odd = spark.createDataFrame(
        [(9, "image", "image/bmp", multimodal.encode_bmp(6, 6, bytes(108)))],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="divisible by 8"):
        multimodal.image_ahash(odd).collect()


def test_audio_fingerprint_catches_planted_reencodes(spark):
    """Audio contour fingerprint: a clip re-encoded with a tiny nudge
    pairs at low Hamming, independent md5-noise clips do not pair, and
    non-divisible sample counts raise."""
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def noise(seed, n=256):
        return [(h60(f"{seed}:{i}") % 4096) - 2048 for i in range(n)]

    a = noise("a")
    # the corpus generator's asymmetric nudge: even slots of two
    # different windows, so it does NOT cancel in the alternating sum
    a_nudged = list(a)
    a_nudged[0] = min(a_nudged[0] + 999, 2047)
    a_nudged[4] = max(a_nudged[4] - 999, -2048)
    rows = [
        (1, "audio", "audio/wav", multimodal.encode_wav(8000, a)),
        (2, "audio", "audio/wav", multimodal.encode_wav(8000, a_nudged)),
        (3, "audio", "audio/wav", multimodal.encode_wav(8000, noise("b"))),
        (4, "audio", "audio/wav", multimodal.encode_wav(8000, noise("c"))),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    pairs = {
        (r.ma, r.mb): r.hamming
        for r in multimodal.audio_near_dup_pairs(media, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert all(p == (1, 2) for p in pairs), f"unexpected pairs: {pairs}"

    ragged = spark.createDataFrame(
        [(9, "audio", "audio/wav", multimodal.encode_wav(8000, noise("d", 100)))],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="divisible by 64"):
        multimodal.audio_contour_hash(ragged).collect()


def test_video_container_and_shot_dedup(spark):
    """SVID container round-trips; a re-edit sharing 5 of 6 frames
    pairs with its source while disjoint videos do not; malformed
    containers raise."""
    def frame(tag):
        px = bytes((7 * i + tag) % 256 for i in range(3 * 16 * 16))
        return multimodal.encode_bmp(16, 16, px)

    frames_a = [frame(t) for t in range(6)]
    enc = multimodal.encode_video(frames_a)
    assert multimodal.decode_video(enc) == [bytes(f) for f in frames_a]
    with pytest.raises(ValueError, match="not an SVID"):
        multimodal.decode_video(b"XXXX" + enc[4:])
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_video(enc[:-3])
    with pytest.raises(ValueError, match="trailing"):
        multimodal.decode_video(enc + b"\x00")

    # the corpus generator's planted re-edit: 9 % 9 == 0 shares frames
    # 1-5 with media 8; 20 is unrelated (md5-seeded frames, so
    # unrelated videos share no fingerprint — unlike a ramp family,
    # whose frames collapse to few distinct hashes)
    docs = spark.createDataFrame([(8,), (9,), (20,)], "doc_id long")
    media = multimodal.synthetic_video_media(docs)
    rows = multimodal.video_near_dup_pairs(media, min_shared=3).collect()
    assert [(r.ma, r.mb, r.n_shared_frames) for r in rows] == [(8, 9, 5)]


def test_ahash_families_expand_exactly_to_pair_form(spark):
    """The family report is a lossless compression of the pair list:
    total member pairs = sum C(size,2) within families (hamming 0)
    + sum cross_pairs over family pairs, and every family pair's
    hamming matches the member pairs it stands for."""
    from salesforce_prefect_etl_pipeline_spark.plans import load_table
    from tests.conftest import SF_SMALL

    media = multimodal.synthetic_bmp_media(
        load_table(spark, SF_SMALL, "documents")
    )
    pair_rows = multimodal.ahash_near_dup_pairs(media, max_hamming=3).collect()
    fam_pairs = multimodal.ahash_near_dup_families(media, max_hamming=3).collect()
    ah = multimodal.image_ahash(media).collect()
    sizes = {}
    for r in ah:
        sizes[(r.h_lo, r.h_hi)] = sizes.get((r.h_lo, r.h_hi), 0) + 1
    within = sum(n * (n - 1) // 2 for n in sizes.values())
    cross = sum(r.cross_pairs for r in fam_pairs)
    assert len(pair_rows) == within + cross
    # per-family-pair hamming equals the member-pair hamming it implies
    rep_hash = {}
    for r in ah:
        key = (r.h_lo, r.h_hi)
        rep_hash.setdefault(key, r.media_id)
        rep_hash[key] = min(rep_hash[key], r.media_id)
    rep_ids = set(rep_hash.values())
    member_pair_h = {(r.ma, r.mb): r.hamming for r in pair_rows}
    for r in fam_pairs:
        assert r.ra in rep_ids and r.rb in rep_ids
        assert member_pair_h.get((r.ra, r.rb)) == r.hamming
        assert r.size_a >= 1 and r.size_b >= 1


def test_ahash_pair_form_guards_oversized_families(spark):
    """Output-size guardrail: an exact-signature family larger than
    max_family_size makes the pair list quadratic no matter the engine,
    so ahash_near_dup_pairs must refuse with a pointer to the linear
    family form; max_family_size=None is the explicit opt-in, and the
    family form itself never guards (its output is family-bounded)."""
    base = bytes((7 * i) % 256 for i in range(3 * 16 * 16))
    rows = [
        (i, "image", "image/bmp", multimodal.encode_bmp(16, 16, base))
        for i in range(1, 7)  # one 6-member identical family
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(multimodal.FamilySizeError, match="ahash_near_dup_families"):
        multimodal.ahash_near_dup_pairs(media, max_hamming=3, max_family_size=5)
    # opt-out emits the full quadratic list: C(6,2) hamming-0 pairs
    opted = multimodal.ahash_near_dup_pairs(
        media, max_hamming=3, max_family_size=None
    ).collect()
    assert len(opted) == 15 and all(r.hamming == 0 for r in opted)
    # at/below the bound the guarded default passes and agrees
    ok = multimodal.ahash_near_dup_pairs(
        media, max_hamming=3, max_family_size=6
    ).collect()
    assert [tuple(r) for r in ok] == [tuple(r) for r in opted]
    # the family form handles the same corpus without a guard: a single
    # identical family means no FAMILY pairs at all — constant output
    fams = multimodal.ahash_near_dup_families(media, max_hamming=3).collect()
    assert fams == []


def test_ahash_pair_guard_persists_hash_frame_for_reuse(spark):
    """With the guard on, the decoded-hash frame is persisted, so the
    banding SELF-JOIN reads the cache instead of decoding the corpus a
    second time — both join sides must be InMemoryTableScans."""
    import contextlib
    import io

    base = bytes((7 * i) % 256 for i in range(3 * 16 * 16))
    rows = [
        (i, "image", "image/bmp", multimodal.encode_bmp(16, 16, base))
        for i in range(1, 4)
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    pairs = multimodal.ahash_near_dup_pairs(media, max_hamming=3, max_family_size=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pairs.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_audio_pair_form_guards_oversized_families(spark):
    """The audio pair op shares the image op's output-size guardrail: a
    planted identical-track family larger than max_family_size refuses
    with a pointer to audio_near_dup_families; None opts into the
    quadratic list; the family form collapses the corpus to zero
    family pairs (one family pairs with nothing)."""
    import numpy as np

    samples = (np.arange(64, dtype=np.int64) * 37) % 1024 - 512
    wav = multimodal.encode_wav(8000, samples)
    rows = [(i, "audio", "audio/wav", wav) for i in range(1, 8)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(multimodal.FamilySizeError, match="audio_near_dup_families"):
        multimodal.audio_near_dup_pairs(media, max_hamming=3, max_family_size=5)
    opted = multimodal.audio_near_dup_pairs(
        media, max_hamming=3, max_family_size=None
    ).collect()
    assert len(opted) == 21 and all(r.hamming == 0 for r in opted)
    ok = multimodal.audio_near_dup_pairs(
        media, max_hamming=3, max_family_size=7
    ).collect()
    assert [tuple(r) for r in ok] == [tuple(r) for r in opted]
    assert multimodal.audio_near_dup_families(media, max_hamming=3).collect() == []


def test_video_pair_form_guards_oversized_families(spark):
    """Same guardrail on the video pair op, keyed by the hottest frame
    fingerprint's collision-group size (that is what the equi-join is
    quadratic in): a planted identical-video family refuses with a
    pointer to video_near_dup_families."""
    base = bytes((7 * i) % 256 for i in range(3 * 16 * 16))
    inv = bytes(255 - b for b in base)
    clip = multimodal.encode_video(
        [multimodal.encode_bmp(16, 16, base), multimodal.encode_bmp(16, 16, inv)]
    )
    rows = [(i, "video", "video/svid", clip) for i in range(1, 8)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(multimodal.FamilySizeError, match="video_near_dup_families"):
        multimodal.video_near_dup_pairs(media, min_shared=1, max_family_size=5)
    opted = multimodal.video_near_dup_pairs(
        media, min_shared=1, max_family_size=None
    ).collect()
    assert len(opted) == 21 and all(r.n_shared_frames >= 1 for r in opted)
    ok = multimodal.video_near_dup_pairs(
        media, min_shared=1, max_family_size=7
    ).collect()
    assert [tuple(r) for r in ok] == [tuple(r) for r in opted]
    # one identical-set family -> no FAMILY pairs at all
    assert multimodal.video_near_dup_families(media, min_shared=1).collect() == []


def test_video_families_expansion_consistency(spark):
    """video_near_dup_pairs is the member-level expansion of
    video_near_dup_families: a family pair (ra, rb) with sizes
    (size_a, size_b) corresponds to size_a * size_b member pairs all
    sharing the same n_shared_frames, and within-family member pairs
    share the family's full distinct fingerprint set."""
    base = bytes((7 * i) % 256 for i in range(3 * 16 * 16))
    inv = bytes(255 - b for b in base)
    clip_a = multimodal.encode_video(
        [multimodal.encode_bmp(16, 16, base), multimodal.encode_bmp(16, 16, inv)]
    )
    clip_b = multimodal.encode_video([multimodal.encode_bmp(16, 16, base)])
    rows = [(i, "video", "video/svid", clip_a) for i in (1, 2, 3)]
    rows += [(i, "video", "video/svid", clip_b) for i in (10, 11)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    fams = multimodal.video_near_dup_families(media, min_shared=1).collect()
    pairs = {
        (r.ma, r.mb): r.n_shared_frames
        for r in multimodal.video_near_dup_pairs(
            media, min_shared=1, max_family_size=None
        ).collect()
    }
    # families: {1,2,3} rep 1 and {10,11} rep 10; they share the base
    # frame's fingerprint (if base and inv hash apart, shared == 1)
    assert len(fams) == 1
    f = fams[0]
    assert (f.ra, f.rb) == (1, 10)
    assert (f.size_a, f.size_b, f.cross_pairs) == (3, 2, 6)
    # every cross member pair exists with the family's shared count
    for a in (1, 2, 3):
        for b in (10, 11):
            assert pairs[(a, b)] == f.n_shared_frames
    # within-family pairs share the family's whole distinct set
    n_sigs_a = pairs[(1, 2)]
    assert pairs[(1, 3)] == n_sigs_a and pairs[(2, 3)] == n_sigs_a
    assert pairs[(10, 11)] >= f.n_shared_frames


def test_spread_ids_raises_to_floor_but_never_shrinks(spark):
    """_spread_ids must parallelize a single-partition scan (the test
    fixtures are single-row-group parquet) yet leave an
    already-partitioned production input untouched — shrinking would
    throw away a real corpus's scan parallelism."""
    docs = load_table(spark, SF_SMALL, "documents")
    assert docs.rdd.getNumPartitions() == 1

    light = multimodal._spread_ids(docs)
    assert light.rdd.getNumPartitions() == 4

    sc = spark.sparkContext
    heavy = multimodal._spread_ids(docs, heavy=True)
    assert heavy.rdd.getNumPartitions() == max(8, sc.defaultParallelism // 4)

    wide = docs.repartition(50)
    assert multimodal._spread_ids(wide).rdd.getNumPartitions() == 50
    assert multimodal._spread_ids(wide, heavy=True).rdd.getNumPartitions() == 50


def test_spread_scan_raises_to_floor_but_never_shrinks(spark):
    from salesforce_prefect_etl_pipeline_spark.queries_llm import _spread_scan

    docs = load_table(spark, SF_SMALL, "documents")
    sc = spark.sparkContext
    floor = max(4, sc.defaultParallelism // 4)
    assert _spread_scan(docs).rdd.getNumPartitions() == floor
    wide = docs.repartition(floor + 7)
    assert _spread_scan(wide).rdd.getNumPartitions() == floor + 7


def test_spread_floors_pinned_through_session_conf(spark):
    """r10 verdict task 6: floors come from session conf (one place,
    env-overridable) — a conf override changes the spread target, a
    floor of 1 disables the spread (and its partition probe), and 0
    falls back to the defaultParallelism formula."""
    import salesforce_prefect_etl_pipeline_spark.queries_llm as qllm

    docs = load_table(spark, SF_SMALL, "documents")
    old = spark.conf.get("spark.salesforceEtl.spread.scanFloor", "0")
    try:
        # runtime conf.set overrides take effect immediately — the floor
        # is re-read per call, same semantics as _spread_ids (r11 advice)
        spark.conf.set("spark.salesforceEtl.spread.scanFloor", "6")
        assert qllm._spread_scan(docs).rdd.getNumPartitions() == 6

        spark.conf.set("spark.salesforceEtl.spread.scanFloor", "1")
        assert qllm._spread_scan(docs) is docs

        spark.conf.set("spark.salesforceEtl.spread.scanFloor", "0")
        floor = max(4, spark.sparkContext.defaultParallelism // 4)
        assert qllm._spread_scan(docs).rdd.getNumPartitions() == floor
    finally:
        spark.conf.set("spark.salesforceEtl.spread.scanFloor", old)

    old_ids = spark.conf.get("spark.salesforceEtl.spread.idsFloor", "4")
    try:
        spark.conf.set("spark.salesforceEtl.spread.idsFloor", "12")
        assert multimodal._spread_ids(docs).rdd.getNumPartitions() == 12
        spark.conf.set("spark.salesforceEtl.spread.idsFloor", "1")
        spread = multimodal._spread_ids(docs)
        assert spread.rdd.getNumPartitions() == docs.rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.salesforceEtl.spread.idsFloor", old_ids)
