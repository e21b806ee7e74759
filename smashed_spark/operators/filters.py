"""Row filters (reference: src/smashed/mappers/filters.py:42-85).

The reference supports 21 "operators" (filters.py:12-34): comparisons,
membership, identity, and arithmetic ops used as truthiness predicates.
If the filtered field is an array the predicate applies *recursively and
ALL elements must pass* (``_recursive_op`` returns ``all(...)``,
filters.py:71-78) — mapped to ``F.forall``.

Scale: a plain ``df.filter`` — Catalyst pushes comparison predicates on
scalar columns down into the parquet scan (check ``PushedFilters`` in
``.explain``), so this costs less than a full read at 100 TB.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ..core.mapper import SparkMapper

_COMPARISONS = {
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "is": lambda c, v: c.eqNullSafe(v),
    "is not": lambda c, v: ~c.eqNullSafe(v),
}

# arithmetic/bitwise ops act as truthiness predicates in the reference
_ARITHMETIC = {
    "+": lambda c, v: c + v,
    "-": lambda c, v: c - v,
    "*": lambda c, v: c * v,
    "/": lambda c, v: c / v,
    "%": lambda c, v: c % v,
    "^": lambda c, v: c.bitwiseXOR(v),
    "**": lambda c, v: F.pow(c, v),
    "<<": lambda c, v: F.shiftleft(c, v),
    ">>": lambda c, v: F.shiftright(c, v),
    "&": lambda c, v: c.bitwiseAND(v),
    "|": lambda c, v: c.bitwiseOR(v),
}

VALID_OPERATIONS = (
    set(_COMPARISONS) | set(_ARITHMETIC) | {"in", "not in"}
)


class FilterMapper(SparkMapper):
    """Filter rows on ``field OP value`` (reference filters.py:42-85)."""

    def __init__(self, field_name: str, operator: str, value: Any) -> None:
        if operator not in VALID_OPERATIONS:
            raise ValueError(
                f"Invalid operator {operator}. Valid operators are "
                f"{', '.join(sorted(VALID_OPERATIONS))}"
            )
        self.field_name = field_name
        self.operator = operator
        self.value = value
        super().__init__(input_fields=[field_name], output_fields=[field_name])

    def _scalar_pred(self, col: Column) -> Column:
        op, v = self.operator, self.value
        if op in _COMPARISONS:
            return _COMPARISONS[op](col, F.lit(v))
        if op in _ARITHMETIC:
            # truthiness of the arithmetic result (reference applies the
            # operator and keeps rows where the result is truthy)
            return _ARITHMETIC[op](col, F.lit(v)).cast("boolean")
        if op == "in":
            # reference: operator.contains(field_value, self.value) —
            # field IS the container
            return self._contains(col, v)
        if op == "not in":
            return ~self._contains(col, v)
        raise AssertionError(op)

    @staticmethod
    def _contains(col: Column, v: Any) -> Column:
        return col.contains(F.lit(v))

    def apply(self, df: DataFrame) -> DataFrame:
        field_type = df.schema[self.field_name].dataType
        col = F.col(self.field_name)
        # recursive ALL-elements semantics on array fields
        depth = 0
        while isinstance(field_type, ArrayType):
            field_type = field_type.elementType
            depth += 1
        pred: Column
        if depth == 0:
            pred = self._scalar_pred(col)
        elif depth == 1:
            pred = F.forall(col, lambda x: self._scalar_pred(x))
        elif depth == 2:
            pred = F.forall(
                col, lambda xs: F.forall(xs, lambda x: self._scalar_pred(x))
            )
        else:
            raise NotImplementedError(
                "FilterMapper supports arrays nested at most 2 deep"
            )
        return df.filter(pred)
