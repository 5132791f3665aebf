"""The frame-index oracle fixture must stay in lockstep with the
synthetic media generator AND the demuxer.

Three-way agreement: (1) construction-math ground truth
(fixture.ground_truth_frame_rows) == (2) demuxer output
(mp4_sample_table) == (3) the checked-in parquet the oracle SQL reads.
If fake_media_table's construction parameters ever change, (1)==(3)
fails loudly instead of the driver seeing a silent hash mismatch.
"""

from __future__ import annotations

import os

from reverse_etl_homebrew_spark.multimodal.binary import (
    _fake_media_rows,
    mp4_sample_table,
)
from reverse_etl_homebrew_spark.multimodal.fixture import (
    FRAME_INDEX_FIXTURE,
    ground_truth_frame_rows,
)


def _parsed_rows(n: int = 120) -> list:
    rows = []
    for i in range(n):
        if i % 3 != 2:
            continue
        payload = bytes(_fake_media_rows(n)[i][1])
        tab = mp4_sample_table(payload)
        for idx, ts, off, size in tab["samples"]:
            rows.append((i, idx, ts, off, size, tab["codec"]))
    return rows


def test_ground_truth_matches_demuxer():
    assert sorted(ground_truth_frame_rows(120)) == sorted(_parsed_rows(120))


def test_checked_in_fixture_is_fresh():
    import duckdb

    assert os.path.exists(FRAME_INDEX_FIXTURE), (
        "fixture missing — run "
        "reverse_etl_homebrew_spark.multimodal.fixture.write_frame_index_fixture()"
    )
    on_disk = duckdb.sql(
        f"SELECT media_id, sample_idx, ts_ms, byte_offset, n_bytes, codec "
        f"FROM read_parquet('{FRAME_INDEX_FIXTURE}') ORDER BY media_id, sample_idx"
    ).fetchall()
    assert [tuple(r) for r in on_disk] == sorted(ground_truth_frame_rows(120))


def test_sampled_selection_matches_query_semantics():
    """The oracle's QUALIFY re-derivation picks the same 118 frames the
    Spark-side bucket sampler keeps (first frame per (video, second);
    40 videos: 20 raw, 10 mjpeg, 10 avc1)."""
    truth = sorted(ground_truth_frame_rows(120))
    last = {}
    picked = []
    for mid, idx, ts, off, size, codec in truth:
        b = ts // 1000
        if last.get(mid) == b:
            continue
        last[mid] = b
        picked.append((mid, idx))
    assert len(picked) == 118


def test_feature_ground_truth_matches_decode_pipeline():
    """Generation-time feature truth must equal the decode pipeline
    EXACTLY (after float32 widening) for every media row — the gate
    that makes the multimodal-decode oracle trustworthy."""
    import numpy as np

    from reverse_etl_homebrew_spark.multimodal.binary import decode_payload
    from reverse_etl_homebrew_spark.multimodal.fixture import (
        ground_truth_media_feature_rows,
    )

    truth = ground_truth_media_feature_rows(120)
    for i in range(120):
        _, payload, meta = _fake_media_rows(120)[i]
        feat, w, h, dur, source = decode_payload(bytes(payload), meta[1])
        t = truth[i]
        assert (w, h, dur, source) == (t[4], t[5], t[6], t[3]), f"row {i}"
        got = [float(np.float32(v)) for v in feat]
        assert got == list(t[7:]), f"row {i}: features diverge"


def test_checked_in_features_fixture_is_fresh():
    import duckdb

    from reverse_etl_homebrew_spark.multimodal.fixture import (
        MEDIA_FEATURES_FIXTURE,
        ground_truth_media_feature_rows,
    )

    assert os.path.exists(MEDIA_FEATURES_FIXTURE), (
        "fixture missing — run write_media_features_fixture()"
    )
    on_disk = duckdb.sql(
        f"SELECT * FROM read_parquet('{MEDIA_FEATURES_FIXTURE}') ORDER BY media_id"
    ).fetchall()
    assert [tuple(r) for r in on_disk] == ground_truth_media_feature_rows(120)
