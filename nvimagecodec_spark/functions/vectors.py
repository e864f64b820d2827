"""Vector math as pure column expressions (JVM-side, no Python).

Used by the similarity-search operators over `array<float>` embedding
columns. All arithmetic is promoted to double before accumulation so
results are reproducible against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Dot product as a statically unrolled expression tree.

    Spark's higher-order functions (aggregate/zip_with) are interpreted
    per element — they never enter whole-stage codegen. For a KNOWN dim,
    sum(a[i]*b[i]) over literal indices compiles into straight-line Java
    (one GetArrayItem+multiply+add chain), which is what you want inside
    a pair join evaluating millions of candidates. Left-to-right
    accumulation matches :func:`dot`'s sequential order bit-for-bit, so
    oracle parity is unaffected.
    """
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
    return acc
