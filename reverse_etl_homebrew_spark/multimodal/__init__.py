from .binary import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    fake_media_table,
    frame_sample_plan,
    media_metadata,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_and_featurize",
    "fake_media_table",
    "frame_sample_plan",
    "media_metadata",
]
