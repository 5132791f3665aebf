from .binary import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    decode_payload,
    decode_png,
    decode_wav,
    encode_mp4_skeleton,
    encode_png,
    encode_wav,
    fake_media_table,
    frame_sample_plan,
    media_metadata,
    mp4_duration_ms,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_and_featurize",
    "decode_payload",
    "decode_png",
    "decode_wav",
    "encode_mp4_skeleton",
    "encode_png",
    "encode_wav",
    "fake_media_table",
    "frame_sample_plan",
    "media_metadata",
    "mp4_duration_ms",
]
