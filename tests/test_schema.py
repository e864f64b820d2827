from pyspark.sql import types as T

import pytest

from nvimagecodec_spark.lakehouse.schema import TableSchema, spark_type_from_name


BASE = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_roundtrip():
    s = TableSchema.from_spark(BASE)
    assert TableSchema.from_dict(s.to_dict()).to_spark() == s.to_spark()


def test_add_rename_widen():
    s = TableSchema.from_spark(BASE)
    s = s.add_column("rating", spark_type_from_name("int"))
    assert s.has_column("rating")
    assert s._col("rating").physical_name == "rating_4"
    s = s.rename_column("text", "body")
    assert s.has_column("body") and not s.has_column("text")
    assert s._col("body").physical_name == "text"  # physical never changes
    assert s._col("body").prev_names == ["text"]
    s = s.widen_column("rating", spark_type_from_name("long"))
    assert s._col("rating").type_name == "bigint"
    assert s._col("rating").physical_type_name == "int"


def test_illegal_widen():
    s = TableSchema.from_spark(BASE)
    with pytest.raises(ValueError):
        s.widen_column("turn_idx", spark_type_from_name("string"))


def test_double_add_rejected():
    s = TableSchema.from_spark(BASE)
    with pytest.raises(ValueError):
        s.add_column("text", spark_type_from_name("string"))
