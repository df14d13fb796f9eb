from .binary_ops import (  # noqa: F401
    MEDIA_META_SCHEMA,
    byte_histogram_features,
    decode_image,
    frame_sample_plan,
    media_fingerprints,
    synthetic_media_from_documents,
)
