from nvimagecodec_spark.operators.lww import lww_dedupe, lww_dedupe_window
from nvimagecodec_spark.operators.merge import merge_into, MergeResult
from nvimagecodec_spark.operators.multimodal import (
    decode_images,
    media_metadata,
    resize_images,
    sample_frames,
)
from nvimagecodec_spark.operators.skew import hot_keys, with_salt

__all__ = [
    "lww_dedupe",
    "lww_dedupe_window",
    "merge_into",
    "MergeResult",
    "hot_keys",
    "with_salt",
    "media_metadata",
    "decode_images",
    "resize_images",
    "sample_frames",
]
