from data_lakehouse_spark.multimodal.columns import (
    attach_binary_payload,
    audio_window_stub,
    audio_windows,
    decode_image,
    decode_image_stub,
    extract_binary_meta,
    feature_extract,
    feature_extract_stub,
    frame_embed_real,
    frame_embed_stub,
    frame_sample_stub,
    resize_image_stub,
)

__all__ = [
    "attach_binary_payload",
    "audio_window_stub",
    "audio_windows",
    "decode_image",
    "decode_image_stub",
    "extract_binary_meta",
    "feature_extract",
    "feature_extract_stub",
    "frame_embed_real",
    "frame_embed_stub",
    "frame_sample_stub",
    "resize_image_stub",
]
