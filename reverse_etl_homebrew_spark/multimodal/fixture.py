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

import os
import struct

from .binary import (
    _JPEG_Q,
    _MP4_MEDIA_TS,
    _fake_media_rows,
    _rawvideo_frame_bytes,
    _stub_content_features,
    _video_feature_agg,
    encode_mjpeg_frame,
)

#: fixture paths referenced by the oracle SQL — resolved relative to
#: the package so the oracle keeps working wherever the repo lives.
_FIXTURE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "fixtures")
)
FRAME_INDEX_FIXTURE = os.path.join(_FIXTURE_DIR, "mp4_frame_index_n120.parquet")
MEDIA_FEATURES_FIXTURE = os.path.join(_FIXTURE_DIR, "media_features_n120.parquet")


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


# ---------------------------------------------------------------------------
# decode-feature ground truth (multimodal-decode oracle)
# ---------------------------------------------------------------------------
#
# The synthetic media generator knows the RAW content (pixel bytes, PCM
# samples, frame planes) before any codec touches it, so the expected
# decode features are computable without running the PNG/WAV/mp4/MJPEG
# DECODERS under test. Shared with the decoders: only the pure
# statistics formulas (channel means, rms, luma motion) and, for
# Motion-JPEG, the documented DC quantization roundtrip — re-derived
# here from the encoder's constants, not by calling decode_jpeg_dc.


def _video_content_truth(frames: list, k: int, max_frames: int = 8) -> list:
    """Feature aggregation over the truth frame pixel buffers: same
    frame-sampling step as the decode paths, then the SAME shared
    numpy reduction (`_video_feature_agg`) the decoders use — so float
    results are bit-identical whenever the decoded pixels match the
    construction-time pixels (which is the thing under test)."""
    step = max(1, len(frames) // max_frames)
    picked = frames[::step][:max_frames]
    return _video_feature_agg(picked, k)


def _mjpeg_decoded_frame_truth(rgb: bytes, width: int, height: int) -> bytes:
    """Expected decode_jpeg_dc output for an encode_mjpeg_frame payload,
    derived from the DC quantization roundtrip (encoder constants +
    T.81 math), not from the bitstream decoder."""
    bw, bh = width // 8, height // 8
    out = bytearray()
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else int(v + 0.5))  # noqa: E731
    for by in range(bh):
        for bx in range(bw):
            sr = sg = sb = 0
            for y in range(by * 8, by * 8 + 8):
                row = y * width * 3
                for x in range(bx * 8, bx * 8 + 8):
                    sr += rgb[row + x * 3]
                    sg += rgb[row + x * 3 + 1]
                    sb += rgb[row + x * 3 + 2]
            mr, mg, mb = sr / 64.0, sg / 64.0, sb / 64.0
            yy = 0.299 * mr + 0.587 * mg + 0.114 * mb
            cb = 128.0 - 0.168736 * mr - 0.331264 * mg + 0.5 * mb
            cr = 128.0 + 0.5 * mr - 0.418688 * mg - 0.081312 * mb
            dy, dcb, dcr = (
                round(8.0 * (v - 128.0) / _JPEG_Q) * _JPEG_Q / 8.0 + 128.0
                for v in (yy, cb, cr)
            )
            out.append(clamp(dy + 1.402 * (dcr - 128.0)))
            out.append(
                clamp(dy - 0.344136 * (dcb - 128.0) - 0.714136 * (dcr - 128.0))
            )
            out.append(clamp(dy + 1.772 * (dcb - 128.0)))
    return bytes(out)


def ground_truth_media_feature_rows(n: int = 120) -> list:
    """Expected decode_and_featurize output per media row — computed
    from generation-time raw content. Returns (media_id, kind,
    decode_ok, content_source, dec_width, dec_height, dec_duration_ms,
    f0..f7) with feature values widened through float32 exactly as the
    Arrow array<float> column stores them."""
    import numpy as np

    f32 = lambda v: float(np.float32(v))  # noqa: E731
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 4 + i % 13, 3 + i % 7
            rgb = bytes(
                (x * 7 + y * 13 + c * 29 + i) % 256
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
            feat = [
                min(w / 4096.0, 1.0),
                min(h / 4096.0, 1.0),
                3 / 4.0,
                float(arr[..., 0].mean()) / 255.0,
                float(arr[..., 1].mean()) / 255.0,
                float(arr[..., 2].mean()) / 255.0,
                float(arr.std()) / 255.0,
                min(w / max(h, 1) / 8.0, 1.0),
            ]
            meta = (w, h, None, "pixels")
        elif kind == "audio":
            n_samp = 160 + (i * 37) % 640
            samples = np.array(
                [((j * (13 + i)) % 4096) - 2048 for j in range(n_samp)],
                dtype=np.int16,
            )
            x = samples.astype(np.float64) / 32768.0
            dur = int(len(x) / 1 / 8000 * 1000)
            zcr = (
                float(np.mean(np.abs(np.diff(np.sign(x))) > 0))
                if len(x) > 1
                else 0.0
            )
            feat = [
                min(dur / 60_000.0, 1.0),
                min(8000 / 48_000.0, 1.0),
                1 / 2.0,
                float(np.sqrt(np.mean(x**2))),
                zcr,
                float(np.mean(np.abs(x))),
                float(np.max(np.abs(x))),
                0.0,
            ]
            meta = (None, None, dur, "pcm")
        else:
            seed = f"media-{i}".encode()
            if i % 6 == 5:
                duration, w, h = 500 + (i * 37) % 7500, 16, 12
                n_samples = max(1, duration * 4 // 1000)
                frames = [
                    _rawvideo_frame_bytes(seed, j, w, h) for j in range(n_samples)
                ]
                content, source = _video_content_truth(frames, 6), "pixels"
            elif i % 12 == 2:
                duration, w, h = 1000 + (i * 53) % 5000, 16, 8
                n_samples = max(1, duration * 4 // 1000)
                frames = [
                    _mjpeg_decoded_frame_truth(
                        _rawvideo_frame_bytes(seed, j, w, h), w, h
                    )
                    for j in range(n_samples)
                ]
                content, source = _video_content_truth(frames, 6), "pixels"
            else:
                duration = (i * 37) % 120_000
                n_samples = max(1, duration * 4 // 1000)
                payload = bytes(_fake_media_rows(n)[i][1])
                content, source = _stub_content_features(payload, 6), "stub-hash"
            feat = [
                min(duration / 120_000.0, 1.0),
                min(n_samples / 4096.0, 1.0),
                *content,
            ]
            meta = (None, None, duration, source)
        rows.append(
            (i, kind, True, meta[3], meta[0], meta[1], meta[2],
             *[f32(v) for v in feat])
        )
    return rows


def write_media_features_fixture(
    path: str = MEDIA_FEATURES_FIXTURE, n: int = 120
) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = ground_truth_media_feature_rows(n)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.int64()),
            "kind": pa.array(cols[1], pa.string()),
            "decode_ok": pa.array(cols[2], pa.bool_()),
            "content_source": pa.array(cols[3], pa.string()),
            "dec_width": pa.array(cols[4], pa.int32()),
            "dec_height": pa.array(cols[5], pa.int32()),
            "dec_duration_ms": pa.array(cols[6], pa.int64()),
            **{
                f"f{k}": pa.array(cols[7 + k], pa.float64())
                for k in range(8)
            },
        }
    )
    pq.write_table(table, path)
    return len(rows)


# ---------------------------------------------------------------------------
# image-resize ground truth (resize oracle)
# ---------------------------------------------------------------------------

IMAGE_RESIZE_FIXTURE = os.path.join(_FIXTURE_DIR, "image_resize_n120.parquet")


def ground_truth_resize_rows(n: int = 120, out_w: int = 8, out_h: int = 8) -> list:
    """Expected resize_images output per IMAGE row, from the
    generation-time raw pixels (PNG is lossless, so the decoded pixels
    must equal the construction pixels; the resize + stats helpers are
    the shared ones, making the md5/means exact)."""
    import hashlib

    from .binary import resize_rgb, resized_stats

    rows = []
    for i in range(n):
        if i % 3 != 0:  # not an image row
            continue
        w, h = 4 + i % 13, 3 + i % 7
        rgb = bytes(
            (x * 7 + y * 13 + c * 29 + i) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        rz = resize_rgb(rgb, w, h, out_w, out_h)
        st = resized_stats(rz, out_w, out_h)
        rows.append(
            (i, True, w, h, out_w, out_h,
             hashlib.md5(rz).hexdigest(), st[0], st[1], st[2])
        )
    return rows


def write_image_resize_fixture(
    path: str = IMAGE_RESIZE_FIXTURE, n: int = 120
) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = ground_truth_resize_rows(n)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.int64()),
            "decode_ok": pa.array(cols[1], pa.bool_()),
            "src_w": pa.array(cols[2], pa.int32()),
            "src_h": pa.array(cols[3], pa.int32()),
            "out_w": pa.array(cols[4], pa.int32()),
            "out_h": pa.array(cols[5], pa.int32()),
            "resized_md5": pa.array(cols[6], pa.string()),
            "mean_r": pa.array(cols[7], pa.float64()),
            "mean_g": pa.array(cols[8], pa.float64()),
            "mean_b": pa.array(cols[9], pa.float64()),
        }
    )
    pq.write_table(table, path)
    return len(rows)


# ---------------------------------------------------------------------------
# audio-resample ground truth (resample oracle)
# ---------------------------------------------------------------------------

AUDIO_RESAMPLE_FIXTURE = os.path.join(_FIXTURE_DIR, "audio_resample_n120.parquet")


def ground_truth_resample_rows(n: int = 120, out_rate: int = 4000) -> list:
    """Expected resample_audio output per AUDIO row, from the
    generation-time raw PCM samples (WAV is lossless int16, so the
    decoded samples must equal the construction samples; the resample
    + stats helpers are the shared ones)."""
    import hashlib

    import numpy as np

    from .binary import pcm_stats, resample_pcm

    rows = []
    for i in range(n):
        if i % 3 != 1:  # not an audio row
            continue
        n_samp = 160 + (i * 37) % 640
        samples = np.array(
            [((j * (13 + i)) % 4096) - 2048 for j in range(n_samp)],
            dtype=np.int16,
        )
        rz = resample_pcm(samples, 8000, out_rate)
        st = pcm_stats(rz)
        rows.append(
            (i, True, 8000, n_samp, out_rate, len(rz),
             hashlib.md5(rz.tobytes()).hexdigest(), st[0], st[1])
        )
    return rows


def write_audio_resample_fixture(
    path: str = AUDIO_RESAMPLE_FIXTURE, n: int = 120
) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = ground_truth_resample_rows(n)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.int64()),
            "decode_ok": pa.array(cols[1], pa.bool_()),
            "src_rate": pa.array(cols[2], pa.int32()),
            "src_n": pa.array(cols[3], pa.int32()),
            "out_rate": pa.array(cols[4], pa.int32()),
            "out_n": pa.array(cols[5], pa.int32()),
            "resampled_md5": pa.array(cols[6], pa.string()),
            "rms": pa.array(cols[7], pa.float64()),
            "peak": pa.array(cols[8], pa.float64()),
        }
    )
    pq.write_table(table, path)
    return len(rows)
