"""Jinja prompt rendering (reference: src/smashed/mappers/promptsource.py).

Python-tier mappers: jinja templates render per row inside
``mapInPandas``/``applyInPandas`` (Arrow-batched).  The jinja
``Environment`` is process-local per executor (the reference hit the
same unpicklable-env problem and solved it the same way with a
singleton — promptsource.py:45-68).

``PromptsourceMapper`` (catalog lookup) requires the ``promptsource``
package and is gated; ``JinjaMapper``/``FewShotJinjaMapper`` only need
jinja2.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, List, Optional, Sequence, Set, Union

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType
from pyspark.sql.window import Window

from ..core.mapper import SparkMapper
from ..core.ship import ensure_shipped

VARSHOTS = "__shots__"
# sentinel replacing the ||| separator so jinja never sees it
# (reference promptsource.py:42)
PIPE_ESCAPE = "\x00PIPE\x00"

_ENV = None


def _env():
    global _ENV
    if _ENV is None:
        from jinja2 import Environment

        _ENV = Environment()
    return _ENV


def find_undeclared_variables(template: str) -> Set[str]:
    from jinja2 import meta

    return meta.find_undeclared_variables(_env().parse(template))


def _render_factory(template: str, extra_vars: Dict[str, Any]):
    """Build a per-executor renderer closure (template compiled lazily)."""
    compiled = {}

    def render(data: Dict[str, Any]) -> List[str]:
        if "t" not in compiled:
            compiled["t"] = _env().from_string(
                template.replace("|||", PIPE_ESCAPE)
            )
        content = compiled["t"].render({**data, **extra_vars})
        return [t.strip() for t in content.split(PIPE_ESCAPE)]

    return render


class JinjaMapper(SparkMapper):
    """Render a jinja template per row into ``source`` (+ ``target``)
    fields (reference promptsource.py:313-354).  Input fields are
    inferred from the template AST; the rendered fields merge over the
    input row (Single-mapper semantics)."""

    def __init__(
        self,
        jinja: str,
        source_field_name: str = "source",
        target_field_name: str = "target",
        return_multiple_targets: bool = False,
        extra_variables: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.template = jinja
        self.src_fld_name = source_field_name
        self.tgt_fld_name = target_field_name
        self.return_multiple_targets = return_multiple_targets
        self.extra_vars = dict(extra_variables or {})
        super().__init__(
            input_fields=sorted(self._template_vars()),
            output_fields=self._output_fields(),
        )

    def _template_vars(self) -> Set[str]:
        return {
            v
            for v in find_undeclared_variables(self.template)
            if v not in self.extra_vars and v != VARSHOTS
        }

    @property
    def has_target(self) -> bool:
        return "|||" in self.template

    def _output_fields(self) -> List[str]:
        out = [self.src_fld_name]
        if self.has_target:
            out.append(self.tgt_fld_name)
        return out

    def config(self):
        return {
            "template": self.template,
            "src": self.src_fld_name,
            "tgt": self.tgt_fld_name,
            "multi": self.return_multiple_targets,
            "extra": {k: repr(v) for k, v in self.extra_vars.items()},
        }

    def _format_output(self, parts: Sequence[str]) -> Dict[str, Any]:
        src, *tgt = parts
        if self.return_multiple_targets:
            return {self.src_fld_name: src, self.tgt_fld_name: list(tgt)}
        if len(tgt) == 0:
            return {self.src_fld_name: src}
        if len(tgt) > 1:
            raise ValueError(
                "Multiple targets, but `return_multiple_targets` is False"
            )
        return {self.src_fld_name: src, self.tgt_fld_name: tgt[0]}

    def _out_schema(self, df: DataFrame) -> StructType:
        tgt_type = (
            ArrayType(StringType())
            if self.return_multiple_targets
            else StringType()
        )
        fields = [
            f
            for f in df.schema.fields
            if f.name not in (self.src_fld_name, self.tgt_fld_name)
        ]
        fields.append(StructField(self.src_fld_name, StringType()))
        if self.has_target:
            fields.append(StructField(self.tgt_fld_name, tgt_type))
        return StructType(fields)

    def apply(self, df: DataFrame) -> DataFrame:
        ensure_shipped(df.sparkSession)
        render = _render_factory(self.template, self.extra_vars)
        format_output = self._format_output
        schema = self._out_schema(df)
        out_cols = [f.name for f in schema.fields]

        def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for rec in pdf.to_dict(orient="records"):
                    rendered = format_output(render(rec))
                    rows.append({**rec, **rendered})
                yield pd.DataFrame(
                    {c: [r.get(c) for r in rows] for c in out_cols}
                )

        return df.mapInPandas(run, schema=schema)


class FewShotJinjaMapper(JinjaMapper):
    """Fold ``num_shots`` consecutive rows into ``__shots__`` context and
    render the (num_shots+1)-th row (reference promptsource.py:357-470).

    Order-sensitive (SURVEY.md §7 risk 1): requires ``order_by``.  Groups
    are formed by ``floor(rank / (num_shots+1))``, folded into one row
    each by a JVM-side ``collect_list`` hash-agg (one shuffle on the
    group id), and rendered in bulk with ``mapInPandas`` — thousands of
    groups per Arrow batch, not one Python call per group.

    Memory bound: a collected group is ``num_shots + 1`` rows, so the
    per-key agg state is O(num_shots × row width), never a whole
    partition; Arrow batch size
    (``spark.sql.execution.arrow.maxRecordsPerBatch``) bounds the
    transfer.  Safe at any corpus size.
    """

    def __init__(
        self,
        jinja: str,
        num_shots: Union[int, str],
        keep_last: bool = False,
        output_source_field_name: str = "source",
        output_target_field_name: str = "target",
        return_multiple_targets: bool = False,
        extra_variables: Optional[Dict[str, Any]] = None,
        order_by: Sequence[str] = (),
        contiguous_key: bool = False,
    ) -> None:
        if num_shots != "max" and not (
            isinstance(num_shots, int) and num_shots >= 0
        ):
            raise ValueError(
                "number_of_shots must be a non-negative integer or 'max', "
                f"but got {num_shots}"
            )
        if VARSHOTS not in find_undeclared_variables(jinja):
            raise KeyError(
                f"the jinja template must contain the variable {VARSHOTS}"
            )
        if not order_by:
            raise ValueError(
                "order_by is required: few-shot grouping is order-sensitive"
            )
        if contiguous_key and len(order_by) != 1:
            raise ValueError("contiguous_key requires a single order_by column")
        self.num_shots = num_shots
        self.keep_last = bool(keep_last or num_shots == "max")
        self.order_by = list(order_by)
        self.contiguous_key = contiguous_key
        super().__init__(
            jinja=jinja,
            source_field_name=output_source_field_name,
            target_field_name=output_target_field_name,
            return_multiple_targets=return_multiple_targets,
            extra_variables=extra_variables,
        )

    def _out_schema(self, df: DataFrame) -> StructType:
        # batched mapper: output rows contain ONLY the rendered fields
        tgt_type = (
            ArrayType(StringType())
            if self.return_multiple_targets
            else StringType()
        )
        fields = [StructField(self.src_fld_name, StringType())]
        if self.has_target:
            fields.append(StructField(self.tgt_fld_name, tgt_type))
        return StructType(fields)

    def apply(self, df: DataFrame) -> DataFrame:
        ensure_shipped(df.sparkSession)
        render = _render_factory(self.template, self.extra_vars)
        format_output = self._format_output
        schema = self._out_schema(df)
        out_cols = [f.name for f in schema.fields]
        group_size = (
            None if self.num_shots == "max" else int(self.num_shots) + 1
        )
        keep_last = self.keep_last
        order_cols = list(self.order_by)

        if group_size is None:
            gid = F.lit(0)
        elif self.contiguous_key:
            # dense 0-based key: group id without a global sort — the
            # scalable path (plain hash shuffle on gid)
            gid = (F.col(self.order_by[0]) / group_size).cast("bigint")
        else:
            w = Window.orderBy(*order_cols)
            rn = F.row_number().over(w) - F.lit(1)
            gid = F.floor(rn / group_size)
        dfg = df.withColumn("__gid__", gid)

        # fold each (tiny) group into ONE row JVM-side — order_cols lead
        # the struct so plain sort_array (codegen'd binary struct
        # compare) realizes the in-group ordering — then render
        # thousands of groups per Arrow batch.  (groupBy().
        # applyInPandas here would pay one Python call + pandas
        # construction per num_shots+1 rows: ~60% of the gate's runtime
        # at sf0.1 was that per-group overhead.)  sort_array demands
        # every struct field be orderable, so when the payload carries
        # an unorderable (map-typed) column, fall back to an array_sort
        # COMPARATOR over only the order columns — interpreted, but it
        # never inspects the payload.
        from pyspark.sql.types import ArrayType as _Arr
        from pyspark.sql.types import MapType as _Map
        from pyspark.sql.types import StructType as _Struct

        def unorderable(dt) -> bool:
            if isinstance(dt, _Map):
                return True
            if isinstance(dt, _Arr):
                return unorderable(dt.elementType)
            if isinstance(dt, _Struct):
                return any(unorderable(f.dataType) for f in dt.fields)
            return False

        rest = [c for c in df.columns if c not in order_cols]
        orderable = not any(unorderable(df.schema[c].dataType) for c in rest)
        records = F.collect_list(F.struct(*order_cols, *rest))
        if orderable:
            folded = F.sort_array(records)
        else:

            def in_group_order(l, r):  # noqa: E741
                cmp = F.lit(0)
                for c in reversed(order_cols):
                    cmp = (
                        F.when(l[c] < r[c], -1)
                        .when(l[c] > r[c], 1)
                        .otherwise(cmp)
                    )
                return cmp

            folded = F.array_sort(records, in_group_order)
        grouped = dfg.groupBy("__gid__").agg(folded.alias("__recs__"))

        def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
            for pdf in batches:
                out: Dict[str, List[Any]] = {c: [] for c in out_cols}
                for recs in pdf["__recs__"]:
                    records = [dict(r) for r in recs]
                    full = (
                        group_size is not None
                        and len(records) == group_size
                    )
                    if not full and not keep_last:
                        continue
                    *shots, sample = records
                    rendered = format_output(
                        render({**sample, VARSHOTS: shots})
                    )
                    for c in out_cols:
                        out[c].append(rendered.get(c))
                yield pd.DataFrame(out, columns=out_cols)

        return grouped.mapInPandas(run, schema=schema)


class PromptsourceMapper(JinjaMapper):
    """Render a template from the promptsource catalog (reference
    promptsource.py:239-310).  Requires the ``promptsource`` package
    (gated — not installed in this environment); the jinja text of the
    catalog template is then rendered exactly like JinjaMapper."""

    def __init__(
        self,
        dataset_name: str,
        template_name: str,
        subset_name: Optional[str] = None,
        source_field_name: str = "source",
        target_field_name: str = "target",
        return_multiple_targets: bool = False,
        extra_variables: Optional[Dict[str, Any]] = None,
    ) -> None:
        try:
            from promptsource.templates import DatasetTemplates
        except ImportError as e:
            raise ImportError(
                "promptsource is not installed; use JinjaMapper with an "
                "explicit template instead"
            ) from e
        dataset = DatasetTemplates(
            dataset_name=dataset_name, subset_name=subset_name
        )
        template = dataset[template_name].jinja
        self.dataset_name = dataset_name
        self.subset_name = subset_name
        self.template_name = template_name
        super().__init__(
            jinja=template,
            source_field_name=source_field_name,
            target_field_name=target_field_name,
            return_multiple_targets=return_multiple_targets,
            extra_variables=extra_variables,
        )
