"""Schema registry: additive-column + type-widening merge.

Generalizes the reference's schema-comparison check
(/root/reference/src/validate.py:167-177 — union of columns of OLD and NEW
with presence flags and dtype strings) into the evolution step a CDC engine
needs: given the table's current schema and an incoming batch's schema,
produce the unified schema (new columns appended, numeric types widened)
or fail loudly on an incompatible change (dropped column, narrowing,
incompatible types). The lake layer (plans/lake.py) then serves old files
upcast to the unified schema without rewriting them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

# integer widening chain (always lossless) and float widening chain
_INT_ORDER: list[type] = [ByteType, ShortType, IntegerType, LongType]
_FLOAT_ORDER: list[type] = [FloatType, DoubleType]


class SchemaEvolutionError(ValueError):
    """Incompatible schema change (narrowing / type conflict)."""


def _rank(dt: DataType, order: list[type]) -> int | None:
    for i, t in enumerate(order):
        if isinstance(dt, t):
            return i
    return None


def widen(a: DataType, b: DataType) -> DataType:
    """Least common widened type of a and b, or raise.

    Cross-family (int vs float) unification is allowed only when it is
    value-preserving: int-or-narrower with any float type widens to
    DOUBLE (a double's 53-bit mantissa holds every int32 exactly).
    LONG vs float/double RAISES — a 64-bit id widened to float corrupts
    values > 2^24 (and to double, > 2^53) silently, which is exactly the
    mid-stream data corruption a CDC engine must refuse; Iceberg's
    evolution rules forbid the same pair."""
    if a == b:
        return a
    ia, ib = _rank(a, _INT_ORDER), _rank(b, _INT_ORDER)
    fa, fb = _rank(a, _FLOAT_ORDER), _rank(b, _FLOAT_ORDER)
    if ia is not None and ib is not None:
        return _INT_ORDER[max(ia, ib)]()
    if fa is not None and fb is not None:
        return _FLOAT_ORDER[max(fa, fb)]()
    if (ia is not None and fb is not None) or (fa is not None and ib is not None):
        int_rank = ia if ia is not None else ib
        if int_rank >= _INT_ORDER.index(LongType):
            raise SchemaEvolutionError(
                f"refusing lossy unification of {a.simpleString()} with "
                f"{b.simpleString()}: 64-bit integers do not fit a float/double "
                "mantissa (ids above 2^53 would be corrupted silently)"
            )
        return DoubleType()
    if isinstance(a, DecimalType) and isinstance(b, DecimalType):
        scale = max(a.scale, b.scale)
        prec = max(a.precision - a.scale, b.precision - b.scale) + scale
        return DecimalType(min(prec, 38), scale)
    if isinstance(a, StructType) and isinstance(b, StructType):
        return merge_schemas(a, b)
    raise SchemaEvolutionError(f"cannot unify {a.simpleString()} with {b.simpleString()}")


def merge_schemas(current: StructType, incoming: StructType) -> StructType:
    """Unified schema: current's columns (widened where the incoming batch
    widened them) followed by incoming's new columns, in arrival order.
    A column missing from ``incoming`` is NOT a drop — CDC batches may
    carry partial payloads; drops are never inferred."""
    inc = {f.name: f for f in incoming.fields}
    fields: list[StructField] = []
    for f in current.fields:
        if f.name in inc:
            fields.append(StructField(f.name, widen(f.dataType, inc[f.name].dataType), True))
        else:
            fields.append(StructField(f.name, f.dataType, True))
    cur_names = {f.name for f in current.fields}
    for f in incoming.fields:
        if f.name not in cur_names:
            fields.append(StructField(f.name, f.dataType, True))
    return StructType(fields)


def _conform_col(col, src: DataType, tgt: DataType):
    """Column expression conforming ``col`` from ``src`` to ``tgt``.

    Struct targets are rebuilt field-by-field (recursing for nested
    widening) because Spark refuses a plain ``cast`` that ADDS a struct
    field — e.g. payload<html,lang> → payload<html,lang,fetch_status> —
    which is exactly what an additive envelope evolution produces. A
    NULL source struct stays NULL (``F.struct`` of nulls would otherwise
    resurrect it as a non-null struct of null fields)."""
    if src == tgt:
        return col
    if isinstance(src, StructType) and isinstance(tgt, StructType):
        present = {f.name: f.dataType for f in src.fields}
        parts = []
        for f in tgt.fields:
            if f.name in present:
                parts.append(
                    _conform_col(col.getField(f.name), present[f.name], f.dataType).alias(f.name)
                )
            else:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        return F.when(col.isNull(), F.lit(None).cast(tgt)).otherwise(F.struct(*parts))
    return col.cast(tgt)


def conform(df: DataFrame, target: StructType) -> DataFrame:
    """Project df onto ``target``: cast present columns up (including
    nested struct widening), fill missing columns with typed nulls. Pure
    projection — Catalyst folds it into the surrounding plan."""
    present = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in present:
            c = _conform_col(F.col(f.name), present[f.name], f.dataType)
        else:
            c = F.lit(None).cast(f.dataType)
        cols.append(c.alias(f.name))
    return df.select(*cols)


@dataclass
class SchemaRegistry:
    """In-memory registry view; the durable copy is the lake snapshot's
    schema (the registry is rebuilt from the table on resume)."""

    current: StructType | None = None

    def merge(self, incoming: StructType) -> StructType:
        if self.current is None:
            # merge-with-self normalizes nullability so snapshot schema
            # strings stay stable across epochs
            self.current = merge_schemas(incoming, incoming)
        else:
            self.current = merge_schemas(self.current, incoming)
        return self.current
