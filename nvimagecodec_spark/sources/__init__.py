from nvimagecodec_spark.sources.changelog import (
    CHANGE_SCHEMA,
    ChangeStream,
    parse_changes,
    FORMAT_REGISTRY,
    SourceFormat,
    register_format,
)

__all__ = [
    "CHANGE_SCHEMA",
    "ChangeStream",
    "parse_changes",
    "FORMAT_REGISTRY",
    "SourceFormat",
    "register_format",
]
