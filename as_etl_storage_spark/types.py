"""Element type system ↔ Spark types.

The reference's value domain is six flat scalar element types
(reference: database/mysql/field.go:143-213, database/oracle/field.go:137-240,
database/dbms/reader/split.go:133-146):

    TypeBool, TypeBigInt (unbounded big.Int), TypeDecimal (exact decimal),
    TypeString, TypeBytes, TypeTime (timestamp + layout decoder).

Spark mapping policy (SURVEY.md §1.2):

    TypeBool    -> BooleanType
    TypeBigInt  -> LongType primarily; DecimalType(38,0) when a source value
                   exceeds int64 (documented precision boundary)
    TypeDecimal -> DecimalType(38,18) default; per-column (p,s) when known
    TypeString  -> StringType
    TypeBytes   -> BinaryType
    TypeTime    -> TimestampType (DateType for day-accuracy layouts)

Time layouts: the reference uses Go layout ``2006-01-02 15:04:05.999999999``
whose prefix length selects precision (database/dbms/reader/split.go:293-327):
10=day, 16=minute, 19=second, 23=ms, 26=us, 29=ns.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

# element type names (string enum mirroring element.ColumnType)
TYPE_BOOL = "bool"
TYPE_BIGINT = "bigInt"
TYPE_DECIMAL = "decimal"
TYPE_STRING = "string"
TYPE_BYTES = "bytes"
TYPE_TIME = "time"

ELEMENT_TYPES = (TYPE_BOOL, TYPE_BIGINT, TYPE_DECIMAL, TYPE_STRING, TYPE_BYTES, TYPE_TIME)

#: Go reference layout -> (python strftime, spark type, unit name)
#: Layout prefix length selects the time accuracy (split.go:293-327).
_LAYOUT_FULL = "2006-01-02 15:04:05.999999999"

#: accuracy name -> (layout prefix length, truncation unit for date_trunc)
TIME_ACCURACIES = {
    "day": (10, "DAY"),
    "min": (16, "MINUTE"),
    "s": (19, "SECOND"),
    "ms": (23, "MILLISECOND"),
    "us": (26, "MICROSECOND"),
    "ns": (29, "MICROSECOND"),  # Spark timestamps are microsecond; ns truncates
}


def layout_for_accuracy(accuracy: str) -> str:
    """Go-style layout string for a named accuracy (split.go:289-359)."""
    if accuracy not in TIME_ACCURACIES:
        raise ValueError(
            f"invalid timeAccuracy {accuracy!r}; want one of {sorted(TIME_ACCURACIES)}"
        )
    n, _ = TIME_ACCURACIES[accuracy]
    return _LAYOUT_FULL[:n]


def accuracy_for_layout(layout: str) -> str:
    """Inverse of :func:`layout_for_accuracy` keyed on prefix length."""
    by_len = {n: name for name, (n, _) in TIME_ACCURACIES.items() if name != "ns"}
    by_len[29] = "ns"
    if len(layout) not in by_len:
        raise ValueError(f"unsupported time layout length {len(layout)} ({layout!r})")
    return by_len[len(layout)]


def spark_type_for(element_type: str) -> T.DataType:
    """Primary Spark type for an element type (SURVEY.md §1.2 table)."""
    mapping = {
        TYPE_BOOL: T.BooleanType(),
        TYPE_BIGINT: T.LongType(),
        TYPE_DECIMAL: T.DecimalType(38, 18),
        TYPE_STRING: T.StringType(),
        TYPE_BYTES: T.BinaryType(),
        TYPE_TIME: T.TimestampType(),
    }
    if element_type not in mapping:
        raise ValueError(f"unsupported element type {element_type!r}")
    return mapping[element_type]


def element_type_for(dt: T.DataType) -> str:
    """Classify a Spark type into the element domain (used by the split
    planner to pick a range convertor, mirroring split.go:63-111)."""
    if isinstance(dt, T.BooleanType):
        return TYPE_BOOL
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return TYPE_BIGINT
    if isinstance(dt, T.DecimalType):
        return TYPE_DECIMAL if dt.scale > 0 else TYPE_BIGINT
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return TYPE_DECIMAL
    if isinstance(dt, T.StringType):
        return TYPE_STRING
    if isinstance(dt, T.BinaryType):
        return TYPE_BYTES
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return TYPE_TIME
    raise ValueError(f"unsupported Spark type for element mapping: {dt}")


@dataclass(frozen=True)
class FieldInfo:
    """Parity with the reference Field/FieldType surface
    (database/field.go:52-92): name + type + nullability."""

    name: str
    data_type: T.DataType
    nullable: bool = True

    @property
    def element_type(self) -> str:
        return element_type_for(self.data_type)

    def to_struct_field(self) -> T.StructField:
        return T.StructField(self.name, self.data_type, self.nullable)


def dedupe_column_names(names: list[str]) -> list[str]:
    """On duplicate result-set column names, rename to name+ordinal —
    parity with database/db.go:425-432 (P10). Generated names are
    themselves claimed and collision-checked: ['a','a','a1'] must NOT
    produce ['a','a1','a1'] (the rename colliding with a real column
    would recreate the ambiguity this exists to remove)."""
    used = set(names)  # real names always win their first occurrence
    taken: set[str] = set()
    out: list[str] = []
    for i, name in enumerate(names):
        if name not in taken:
            taken.add(name)
            out.append(name)
            continue
        cand = f"{name}{i}"
        while cand in used or cand in taken:
            cand = f"{cand}_"
        taken.add(cand)
        out.append(cand)
    return out
