"""Benchmark configuration registry.

Mirrors the reference's plain-Python dict registry
(``public_benchmark/public_configs.py:56-429``): entries keyed
``{model}_{resolution}_{year}`` with data paths and per-model loader
quirks, plus the ECMWF-style evaluation regions
(``public_benchmark/run_benchmark_evaluation.py:110-131``).

Paths point at the public WeatherBench-2 GCS buckets; reading them
requires xarray+zarr+gcsfs (optional). The registry structure — not the
store format — is the contract the CLIs consume, so local npz datasets
plug in the same way.
"""

from typing import Any, Mapping

DEFAULT_LEVELS = [500, 700, 850]

# ECMWF-style evaluation regions: {name: ((lat_min, lat_max),
# (lon_min, lon_max))}; longitude boxes may wrap the dateline.
REGIONS: Mapping[str, tuple] = {
    'global': ((-90, 90), (0, 360)),
    'tropics': ((-20, 20), (0, 360)),
    'northern-hemisphere': ((20, 90), (0, 360)),
    'southern-hemisphere': ((-90, -20), (0, 360)),
    'europe': ((35, 75), (-12.5, 42.5)),
    'north-america': ((25, 60), (360 - 120, 360 - 75)),
    'north-atlantic': ((25, 65), (360 - 70, 360 - 10)),
    'north-pacific': ((25, 60), (145, 360 - 130)),
    'east-asia': ((25, 60), (102.5, 150)),
    'ausnz': ((-45, -12.5), (120, 175)),
    'arctic': ((60, 90), (0, 360)),
    'antarctic': ((-90, -60), (0, 360)),
    'northern-africa': ((5, 32.5), (-12.5, 37.5)),
    'southern-africa': ((-30, 5), (12.5, 37.5)),
    'south-america': ((-40, 5), (-75, -45)),
    'west-asia': ((15, 60), (42.5, 102.5)),
    'south-east-asia': ((-12.5, 25), (95, 125)),
}

SEEPS_DRY_THRESHOLDS_MM = {
    'total_precipitation_6hr': 0.1,
    'total_precipitation_24hr': 0.25,
}

RESOLUTIONS = ('64x32', '240x121', '1440x721')
WB2 = 'gs://weatherbench2'


def _deterministic_entry(model: str, resolution: str, year: int,
                         **kwargs) -> dict[str, Any]:
  return {
      'path': f'{WB2}/datasets/{model}/{year}-{resolution}_equiangular'
              '_with_poles_conservative.zarr',
      'data_loader_kwargs': kwargs,
  }


# Deterministic (single-member) prediction registry. Representative subset
# of the ~25 models in the reference registry; add entries freely — the
# CLIs only require 'path' and optional 'data_loader_kwargs'.
deterministic_prediction_configs: dict[str, dict[str, Any]] = {}
for _resolution in RESOLUTIONS:
  for _year in (2018, 2020, 2022):
    for _model in ('hres', 'graphcast', 'pangu', 'keisler', 'fuxi',
                   'neuralgcm_deterministic'):
      deterministic_prediction_configs[
          f'{_model}_{_resolution}_{_year}'] = _deterministic_entry(
              _model, _resolution, _year)

# Models whose data needs special handling (reference ``:229-248``).
deterministic_prediction_configs.update({
    f'keisler_{r}_{y}': {
        **_deterministic_entry('keisler', r, y),
        # Keisler outputs contain NaNs: evaluate with skipna.
        'aggregator_kwargs': {'skipna': True},
    }
    for r in RESOLUTIONS for y in (2020,)
})

# Probabilistic (ensemble) registry.
probabilistic_prediction_configs: dict[str, dict[str, Any]] = {
    f'ens_{r}_{y}': {
        'path': f'{WB2}/datasets/ens/{y}-{r}_equiangular_with_poles'
                '_conservative.zarr',
        'data_loader_kwargs': {},
    }
    for r in RESOLUTIONS for y in (2018, 2020, 2022)
}

# Ground-truth registry.
target_configs: dict[str, dict[str, Any]] = {
    f'era5_{r}': {
        'path': f'{WB2}/datasets/era5/1959-2023_01_10-{r}_equiangular'
                '_with_poles_conservative.zarr',
        'data_loader_kwargs': {},
    }
    for r in RESOLUTIONS
}

# Climatology registry (dayofyear × hour statistics incl. SEEPS fields).
climatology_configs: dict[str, dict[str, Any]] = {
    f'era5_{r}': {
        'path': f'{WB2}/datasets/era5-hourly-climatology/1990-2019_6h_'
                f'{r}_equiangular_with_poles_conservative.zarr',
    }
    for r in RESOLUTIONS
}


def single_member_configs() -> dict[str, dict[str, Any]]:
  """Derives single-member configs from the probabilistic registry.

  Mirrors reference ``public_configs.py:264-285``: evaluate ensemble member
  0 as a deterministic forecast.
  """
  out = {}
  for key, cfg in probabilistic_prediction_configs.items():
    out[key.replace('ens_', 'ens-member0_')] = {
        **cfg,
        'data_loader_kwargs': {
            **cfg.get('data_loader_kwargs', {}),
            'sel_kwargs': {'number': 0},
        },
    }
  return out
