from nvimagecodec_spark.lakehouse.replica import TableReplica
from nvimagecodec_spark.lakehouse.table import LakeTable, Snapshot
from nvimagecodec_spark.lakehouse.txn import MultiTableTxn, TxnCatalog, TxnReplayNeeded

__all__ = ["LakeTable", "Snapshot", "MultiTableTxn", "TableReplica", "TxnCatalog", "TxnReplayNeeded"]
