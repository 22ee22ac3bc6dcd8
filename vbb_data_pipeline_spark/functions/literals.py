"""Pure-JVM literal DataFrames for small driver-side row sets.

``spark.createDataFrame(list_of_rows)`` wraps the rows in a Python RDD
(``applySchemaToPythonRDD`` → ``Scan ExistingRDD`` in the physical
plan). That scan is re-evaluated through a Python worker on EVERY
execution of EVERY plan subtree that references it — measured in the
r10 optimization pass at ~0.3-0.6 s of blocked (non-CPU) task time per
scan per run on the bench queries, with the adversarial-row unions and
centroid tables appearing 2-4× per plan. It also splits whole-stage
codegen around the scan and can't participate in LocalRelation
optimizations (constant propagation, broadcast-from-driver shortcuts).

:func:`literal_rows_df` builds the same rows as a literal expression
tree instead — ``explode(array(struct(...), ...))`` over a one-row
range — so execution is JVM-only: zero Python processes, codegen-able,
and eligible for Catalyst's eager local-relation evaluation.

Value fidelity matches ``createDataFrame``'s converters: Python floats
ARE IEEE doubles and ``F.lit`` ships them bit-exactly over py4j;
``float`` target fields truncate double→float32 in the JVM exactly as
``FloatType.toInternal`` does on the Python side; ints/longs/strings/
bools/NULLs are exact. Intended for MODEL/FIXTURE-scale data (tens to
a few thousand literals); anything larger belongs in a real scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["literal_rows_df"]


def _lit_value(v, dt: T.DataType):
    if v is None:
        return F.lit(None).cast(dt)
    if isinstance(dt, T.ArrayType):
        return F.array(
            *[_lit_value(x, dt.elementType) for x in v]
        ).cast(dt)
    return F.lit(v).cast(dt)


def literal_rows_df(
    spark: SparkSession,
    rows: Sequence,
    schema: str | T.StructType,
) -> DataFrame:
    """``createDataFrame(rows, schema)`` as a pure-JVM literal plan.

    ``rows``: sequence of tuples/Rows positionally matching ``schema``
    (a DDL string like ``"vec_id long, embedding array<float>"`` or a
    StructType). Supports atomic types and (nested) arrays; NULLs and
    NULL array elements allowed. Empty ``rows`` yields an empty frame
    with the right schema (single empty JVM range, no tasks through
    Python).
    """
    st = T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    fields = st.fields
    if not rows:
        return spark.range(0, 0, 1, 1).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in fields]
        )
    structs = [
        F.struct(
            *[
                _lit_value(row[i], f.dataType).alias(f.name)
                for i, f in enumerate(fields)
            ]
        )
        for row in rows
    ]
    return (
        spark.range(0, 1, 1, 1)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select(*[F.col(f"_r.{f.name}").alias(f.name) for f in fields])
    )
