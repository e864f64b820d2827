from nvimagecodec_spark.oracle.pandas_applier import apply_events_pandas

__all__ = ["apply_events_pandas"]
