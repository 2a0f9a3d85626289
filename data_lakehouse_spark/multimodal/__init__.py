from data_lakehouse_spark.multimodal.columns import (
    attach_binary_payload,
    decode_image_stub,
    extract_binary_meta,
    frame_sample_stub,
)

__all__ = [
    "attach_binary_payload",
    "decode_image_stub",
    "extract_binary_meta",
    "frame_sample_stub",
]
