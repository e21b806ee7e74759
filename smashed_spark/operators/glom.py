"""Nested-path extraction (reference: src/smashed/mappers/glom.py).

The reference walks glom specs like ``('answers', 'text', [('a','b')])``
over nested dicts.  Spark structs make path access native:
``F.col("answers.text")``; the list-spec fanout branch ``[...]`` maps to
``F.transform`` over an array of structs.  That native tier covers the
reference's own test surface (tests/test_glom.py) with zero Python.

Specs the native tier can't express (fanout not in last position,
dict specs, callables, nested chains) run in the Python tier: an
Arrow-batched ``mapInPandas`` evaluating the real ``glom`` library when
importable, else a built-in interpreter covering glom's core spec
algebra (dotted paths, tuple chains, list fanout, dict multi-extract,
callables).  Arbitrary spec output types aren't statically inferable,
so exotic specs require ``output_types`` (DDL strings) — a plan-time
contract error tells the user exactly what to pass.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.mapper import SparkMapper

Spec = Union[str, Sequence]


def pyglom(target: Any, spec: Any) -> Any:
    """Evaluate a glom spec over plain dict/list data.

    Uses the real ``glom`` package when installed; otherwise a built-in
    interpreter of the core spec algebra (same semantics as
    glom.glom for: dotted-path str, tuple = chain, [spec] = fanout,
    dict = multi-extract, callable = apply).
    """
    try:
        import glom as _glom  # type: ignore

        return _glom.glom(target, _to_glom_spec(spec))
    except ImportError:
        pass
    if isinstance(spec, str):
        for part in spec.split("."):
            if isinstance(target, dict):
                target = target[part]
            else:
                target = getattr(target, part)
        return target
    if isinstance(spec, tuple):
        for sub in spec:
            target = pyglom(target, sub)
        return target
    if isinstance(spec, list):
        if len(spec) != 1:
            raise NotImplementedError(
                f"list spec must have exactly one element: {spec!r}"
            )
        return [pyglom(x, spec[0]) for x in target]
    if isinstance(spec, dict):
        return {k: pyglom(target, sub) for k, sub in spec.items()}
    if callable(spec):
        return spec(target)
    raise NotImplementedError(f"unsupported glom spec: {spec!r}")


def _to_glom_spec(spec: Any) -> Any:
    """Our Spec aliases map 1:1 onto glom's native spec language."""
    return spec


class GlomMapper(SparkMapper):
    """Extract nested paths into flat fields (reference glom.py:51-71).

    ``output_types`` maps destination fields to Spark DDL type strings;
    required only for specs that need the Python fallback tier.
    """

    def __init__(
        self,
        spec_fields: Dict[str, Spec],
        output_types: Optional[Dict[str, str]] = None,
    ) -> None:
        self.spec_fields = dict(spec_fields)
        self.output_types = dict(output_types or {})
        super().__init__(output_fields=list(spec_fields))

    def config(self):
        return {"spec_fields": {k: repr(v) for k, v in self.spec_fields.items()}}

    @classmethod
    def _compile(cls, spec: Spec) -> "_CompiledSpec":
        if isinstance(spec, str):
            # dotted path string is a glom shorthand
            return _CompiledSpec(spec.split("."), None)
        if isinstance(spec, dict) or callable(spec):
            # dict multi-extract / callable specs are Python-tier only
            raise NotImplementedError(f"non-path glom spec: {spec!r}")
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
        native: Dict[str, Column] = {}
        exotic: Dict[str, Spec] = {}
        for dest, spec in self.spec_fields.items():
            try:
                native[dest] = self._compile(spec).to_column()
            except (NotImplementedError, ValueError):
                exotic[dest] = spec
        if native:
            df = df.withColumns(native)
        if exotic:
            df = self._apply_python(df, exotic)
        return df

    def _apply_python(self, df: DataFrame, exotic: Dict[str, Spec]) -> DataFrame:
        """Arrow-batched fallback for specs beyond path+fanout: rows
        become plain dicts (Arrow structs arrive as dicts, arrays as
        lists/ndarrays) and :func:`pyglom` evaluates the spec."""
        missing = sorted(set(exotic) - set(self.output_types))
        if missing:
            raise ValueError(
                f"glom specs for {missing} need the Python fallback tier, "
                "whose result type is not statically inferable: pass "
                "output_types={field: spark_ddl_type} for them "
                "(e.g. output_types={'answers': 'array<string>'})"
            )
        from pyspark.sql.types import StructType

        fields = [f for f in df.schema.fields if f.name not in exotic]
        schema = StructType(fields)
        for dest in exotic:
            typed = StructType.fromDDL(f"`{dest}` {self.output_types[dest]}")
            schema = schema.add(typed.fields[0])
        col_order = [f.name for f in schema.fields]
        specs = dict(exotic)

        def run(batches):
            for pdf in batches:
                records = pdf.to_dict("records")
                for dest, spec in specs.items():
                    pdf[dest] = [pyglom(r, spec) for r in records]
                yield pdf[col_order]

        from ..core.ship import ensure_shipped

        ensure_shipped(df.sparkSession)
        return df.mapInPandas(run, schema=schema)


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
