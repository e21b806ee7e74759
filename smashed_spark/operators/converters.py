"""Tensor conversion (reference: src/smashed/mappers/converters.py).

Torch tensors cannot live in a distributed DataFrame — conversion is a
*client-edge* operation applied after ``collect()`` / ``toPandas()``
(SURVEY.md §1.4).  These helpers mirror the reference API surface;
``Python2TorchMapper.apply`` is deliberately unsupported inside Spark
plans.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame

from ..core.mapper import SparkMapper


def _require_torch():
    try:
        import torch

        return torch
    except ImportError as e:
        raise ImportError(
            "torch is not installed; tensor conversion unavailable"
        ) from e


def rows_to_torch(
    rows: List[Dict[str, Any]],
    field_cast_map: Optional[Dict[str, str]] = None,
    device: Optional[str] = None,
) -> List[Dict[str, Any]]:
    """Convert collected rows' list fields to torch tensors (reference
    Python2TorchMapper.transform, converters.py:72-81)."""
    torch = _require_torch()
    cast_map = field_cast_map or {}
    out = []
    for row in rows:
        new = {}
        for k, v in row.items():
            if isinstance(v, (list, int, float)):
                t = torch.tensor(v)
                if k in cast_map:
                    t = t.to(getattr(torch, cast_map[k]))
                if device:
                    t = t.to(device)
                new[k] = t
            else:
                new[k] = v
        out.append(new)
    return out


def torch_to_rows(rows: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Inverse (reference Torch2PythonMapper, converters.py:105-140)."""
    torch = _require_torch()
    return [
        {
            k: v.tolist() if isinstance(v, torch.Tensor) else v
            for k, v in row.items()
        }
        for row in rows
    ]


class Python2TorchMapper(SparkMapper):
    """API-parity stub: torch conversion happens at the client edge, not
    inside a Spark plan (reference converters.py:22-102)."""

    def __init__(
        self,
        field_cast_map: Optional[Dict[str, str]] = None,
        device: Optional[str] = None,
    ) -> None:
        _require_torch()
        self.field_cast_map = dict(field_cast_map or {})
        self.device = device
        super().__init__()

    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "Python2TorchMapper is a client-edge operation: collect() the "
            "DataFrame and use rows_to_torch()"
        )


class Torch2PythonMapper(SparkMapper):
    """API-parity stub (reference converters.py:105-140)."""

    def __init__(self) -> None:
        _require_torch()
        super().__init__()

    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "Torch2PythonMapper is a client-edge operation: use "
            "torch_to_rows() on collected rows"
        )
