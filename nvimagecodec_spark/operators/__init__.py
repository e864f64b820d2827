from nvimagecodec_spark.operators.lww import lww_dedupe, lww_dedupe_window
from nvimagecodec_spark.operators.merge import merge_into, MergeResult
from nvimagecodec_spark.operators.skew import hot_keys, with_salt

__all__ = [
    "lww_dedupe",
    "lww_dedupe_window",
    "merge_into",
    "MergeResult",
    "hot_keys",
    "with_salt",
]
