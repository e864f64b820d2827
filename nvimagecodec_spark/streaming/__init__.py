from nvimagecodec_spark.streaming.engine import CdcEngine
from nvimagecodec_spark.streaming.ratelimit import AdaptiveRateController

__all__ = ["CdcEngine", "AdaptiveRateController"]
