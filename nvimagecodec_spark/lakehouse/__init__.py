from nvimagecodec_spark.lakehouse.table import LakeTable, Snapshot

__all__ = ["LakeTable", "Snapshot"]
