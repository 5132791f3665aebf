#!/usr/bin/env python
"""Media-tier poison fixture (VERDICT r10 #5): deterministic
corruption of the synthetic media table so the decode tier's DLQ
contract can be proven systematically, not just on one empty payload.

Arms, by media_id % 10 (applied over fake_media_table rows):
  1 -> truncated payload (first half of the bytes — for PNG this cuts
       mid-IDAT, for WAV mid-data, for mp4 mid-moov)
  2 -> zero-length payload (b"")
  3 -> NULL payload column
  4 -> garbage bytes (deterministic xorshift noise, right length)
  5 -> mime lie: metadata claims a different codec than the bytes
       (the decoder is mime-routed, so this must fail LOUD per row,
       never mis-decode)
  6 -> lying dimensions/duration: metadata width/height/duration_ms
       inflated 10x (payload untouched — decode must succeed and
       report dims from the BYTES, proving metadata is never trusted
       for content)
  7 -> NULL metadata struct (payload untouched — unroutable without
       a mime, so it must land as a decode_ok=false DLQ row)
  other -> untouched healthy rows

The contract under poison: decode_and_featurize never fails a task;
every corrupted-payload row lands as decode_ok=false; healthy and
arm-6 rows stay decode_ok=true with byte-derived dimensions; the
whole result is deterministic. Pinned in
tests/test_multimodal_observability.py.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIME_LIE = {"image/png": "audio/wav", "audio/wav": "video/mp4", "video/mp4": "image/png"}

# arms that must land as decode_ok=false DLQ rows: corrupted payloads
# plus the NULL-metadata arm (the decoder is mime-routed, so a row
# without metadata cannot be routed — loud per-row failure, not a
# guess)
BROKEN_ARMS = {1, 2, 3, 4, 5, 7}
# arm that must still decode (dimension/duration lies only — content
# comes from the bytes, never the metadata)
META_ARMS = {6}


def _noise(n: int, seed: int) -> bytes:
    x = (seed * 2654435761 + 1) & 0xFFFFFFFF
    out = bytearray()
    for _ in range(n):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


def poisoned_media_rows(n: int = 120):
    """(rows, arm_by_id): the poisoned copy of _fake_media_rows(n)."""
    from reverse_etl_homebrew_spark.multimodal.binary import _fake_media_rows

    rows, arms = [], {}
    for media_id, payload, meta in _fake_media_rows(n):
        arm = media_id % 10
        kind, mime, w, h, dur, size = meta
        p = bytes(payload)
        if arm == 1:
            p = p[: max(1, len(p) // 2)]
        elif arm == 2:
            p = b""
        elif arm == 3:
            p = None
        elif arm == 4:
            p = _noise(len(p), media_id)
        elif arm == 5:
            mime = MIME_LIE[mime]
        elif arm == 6:
            w = None if w is None else w * 10
            h = None if h is None else h * 10
            dur = None if dur is None else dur * 10
        elif arm == 7:
            meta = None
        if arm != 7:
            meta = (kind, mime, w, h, dur, size)
        arms[media_id] = arm
        rows.append((media_id, None if p is None else bytearray(p), meta))
    return rows, arms


def poisoned_media_table(spark, n: int = 120):
    from reverse_etl_homebrew_spark.multimodal.binary import MEDIA_SCHEMA

    rows, arms = poisoned_media_rows(n)
    return spark.createDataFrame(rows, MEDIA_SCHEMA), arms


def main() -> None:
    from reverse_etl_homebrew_spark.multimodal import decode_and_featurize
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("media-poison")
    df, arms = poisoned_media_table(spark, 120)
    out = {r["media_id"]: r for r in decode_and_featurize(df).collect()}
    bad = []
    for mid, arm in arms.items():
        ok = out[mid]["decode_ok"]
        if arm in BROKEN_ARMS and ok:
            bad.append((mid, arm, "decoded a corrupted payload"))
        if arm not in BROKEN_ARMS and not ok:
            bad.append((mid, arm, "healthy/meta-poison row failed"))
    print(f"rows: {len(out)}  arms: {len(arms)}  violations: {bad}")
    spark.stop()


if __name__ == "__main__":
    main()
