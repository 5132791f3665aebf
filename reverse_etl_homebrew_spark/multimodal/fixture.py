"""Generation-time ground truth for the video frame index.

``fake_media_table`` builds its mp4 payloads from known construction
parameters (fps, duration, per-frame sizes — ``encode_mp4_skeleton``),
so the true sample table is known *without* running the
``mp4_sample_table`` demuxer that ``video_frame_index`` is built on.
This module recomputes that truth independently and writes it as a
parquet fixture, giving the `video-frame-index` driver key a real
DuckDB oracle: the SQL reads the fixture and re-derives the 1-per-
second frame selection, so the demux (offsets/sizes/timestamps) AND
the sampling logic are both checked against construction-time facts.

Independence argument: the only number taken from payload bytes is the
mdat body offset, recovered by a 6-line *top-level* box walk (ftyp →
moov → mdat) that shares no code with the stbl parser under test;
everything else (frame count, per-frame sizes, 90 kHz timestamps) is
recomputed from the same arithmetic the encoder used.
"""

from __future__ import annotations

import struct

from .binary import (
    _MP4_MEDIA_TS,
    _fake_media_rows,
    _rawvideo_frame_bytes,
    encode_mjpeg_frame,
)

#: repo-absolute fixture path referenced by the oracle SQL.
FRAME_INDEX_FIXTURE = "/root/repo/fixtures/mp4_frame_index_n120.parquet"


def _mdat_body_offset(payload: bytes) -> int:
    """Offset of the first mdat byte via a top-level box walk —
    independent of the sample-table demuxer."""
    pos = 0
    while pos + 8 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        if payload[pos + 4 : pos + 8] == b"mdat":
            return pos + 8
        if size < 8:
            raise ValueError("bad box size")
        pos += size
    raise ValueError("no mdat box")


def ground_truth_frame_rows(n: int = 120) -> list:
    """Full (unsampled) per-frame rows for every video payload in
    ``fake_media_table(spark, n)``: (media_id, sample_idx, ts_ms,
    byte_offset, n_bytes, codec). Mirrors the construction parameters
    in ``_fake_media_rows`` / ``encode_mp4_skeleton`` (fps=4, media
    timescale 90 kHz, contiguous single-chunk mdat)."""
    fps = 4
    delta = _MP4_MEDIA_TS // fps
    rows = []
    for i in range(n):
        if i % 3 != 2:  # not a video row
            continue
        if i % 6 == 5:
            codec = "raw "
            duration = 500 + (i * 37) % 7500
            sizes_of = lambda ns: [16 * 12 * 3] * ns
        elif i % 12 == 2:
            # Motion-JPEG rows: frame sizes are the lengths of the
            # real encoded JPEGs — generation-time knowledge (the
            # encoder, not the demuxer under test)
            codec = "jpeg"
            duration = 1000 + (i * 53) % 5000
            seed = f"media-{i}".encode()
            sizes_of = lambda ns, s=seed: [
                len(encode_mjpeg_frame(16, 8, _rawvideo_frame_bytes(s, j, 16, 8)))
                for j in range(ns)
            ]
        else:
            codec = "avc1"
            duration = (i * 37) % 120_000
            sizes_of = lambda ns: [24 + (j % 7) * 8 for j in range(ns)]
        n_samples = max(1, duration * fps // 1000)
        sizes = sizes_of(n_samples)
        payload = bytes(_fake_media_rows(n)[i][1])
        off = _mdat_body_offset(payload)
        for j in range(n_samples):
            ts_ms = j * delta * 1000 // _MP4_MEDIA_TS
            rows.append((i, j, ts_ms, off, sizes[j], codec))
            off += sizes[j]
    return rows


def write_frame_index_fixture(path: str = FRAME_INDEX_FIXTURE, n: int = 120) -> int:
    """Write the ground-truth frame table as parquet (pyarrow, no
    Spark); returns the row count. Types match FRAME_INDEX_SCHEMA."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = ground_truth_frame_rows(n)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.int64()),
            "sample_idx": pa.array(cols[1], pa.int32()),
            "ts_ms": pa.array(cols[2], pa.int64()),
            "byte_offset": pa.array(cols[3], pa.int64()),
            "n_bytes": pa.array(cols[4], pa.int32()),
            "codec": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, path)
    return len(rows)
