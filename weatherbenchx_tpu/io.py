"""Self-contained dataset (de)serialization.

xarray/netCDF/zarr are optional in this environment, so the framework ships
its own lossless container for ``dict[str, DimArray]`` datasets: a single
``.npz`` file holding every data/coord array plus a JSON structure record.
Datetime64/timedelta64/string coords round-trip exactly.

``to_xarray_dataset``/``from_xarray_dataset`` provide interop when xarray
is installed (mirrors the reference's netCDF artifacts, e.g.
``beam_pipeline.py:369-404``).
"""

import io as _io
import json
from typing import Hashable, Mapping

import numpy as np

from weatherbenchx_tpu.darray import Coord, DimArray

Dataset = Mapping[Hashable, DimArray]


def save_dataset(path: str, dataset: Dataset) -> None:
  """Writes a dict[var, DimArray] dataset to an .npz container."""
  arrays: dict[str, np.ndarray] = {}
  meta: dict = {'version': 1, 'variables': {}}
  for i, (var, da) in enumerate(dataset.items()):
    key = f'v{i}'
    meta['variables'][str(var)] = {
        'key': key,
        'dims': list(da.dims),
        'coords': {
            str(name): {'key': f'{key}.c{j}', 'dims': list(c.dims)}
            for j, (name, c) in enumerate(da.coords.items())
        },
    }
    arrays[key] = np.asarray(da.data)
    for j, (name, c) in enumerate(da.coords.items()):
      arrays[f'{key}.c{j}'] = np.asarray(c.values)
  arrays['__meta__'] = np.frombuffer(
      json.dumps(meta).encode(), dtype=np.uint8)
  with open(path, 'wb') as f:
    np.savez(f, **arrays)


def load_dataset(path: str) -> dict[str, DimArray]:
  """Reads a dataset written by save_dataset."""
  with np.load(path, allow_pickle=False) as npz:
    meta = json.loads(bytes(npz['__meta__']).decode())
    out: dict[str, DimArray] = {}
    for var, spec in meta['variables'].items():
      coords = {
          name: Coord(tuple(cspec['dims']), npz[cspec['key']])
          for name, cspec in spec['coords'].items()
      }
      out[var] = DimArray(npz[spec['key']], tuple(spec['dims']), coords)
  return out


def to_xarray_dataset(dataset: Dataset):
  """Optional xarray interop (requires xarray installed)."""
  import xarray as xr

  return xr.Dataset({str(k): v.to_xarray() for k, v in dataset.items()})


def from_xarray_dataset(ds) -> dict[str, DimArray]:
  return {str(k): DimArray.from_xarray(ds[k]) for k in ds.data_vars}
