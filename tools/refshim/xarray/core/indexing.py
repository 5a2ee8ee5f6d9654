"""Shim of xarray.core.indexing.map_index_queries (label→positional lookup).

Only the usage in reference metrics/probabilistic.py:890 is supported:
``map_index_queries(da, {dim: indexer_da}, method=...).dim_indexers[dim]``.
"""

import dataclasses
from typing import Any, Mapping


@dataclasses.dataclass
class _IndexQueryResult:
  dim_indexers: Mapping[str, Any]


def map_index_queries(obj, indexers, method=None, tolerance=None, **kwargs):
  dim_indexers = {}
  for dim, key in dict(indexers).items():
    dim_indexers[dim] = obj._label_to_positional(
        dim, key, method=method, tolerance=tolerance)
  return _IndexQueryResult(dim_indexers=dim_indexers)
