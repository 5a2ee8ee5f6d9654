"""xarray.core shim surface: indexing.map_index_queries + accessor_dt classes."""

from . import accessor_dt
from . import indexing
