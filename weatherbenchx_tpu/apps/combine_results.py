"""Combines per-(model, year, resolution) results into one scorecard.

TPU equivalent of ``public_benchmark/combine_results.py:221-303``: reads
each model's metric file, renames metrics/regions/variables, stacks
metrics into a 'metric' dim and models into a 'model' dim, writes one
scorecard dataset (.npz container; export to Zarr/netCDF via
``io.to_xarray_dataset`` when xarray is installed).
"""

import argparse
import os
from typing import Mapping, Optional, Sequence

import numpy as np

from weatherbenchx_tpu import darray
from weatherbenchx_tpu import io as io_lib
from weatherbenchx_tpu.darray import Coord, DimArray

# Display renames (reference ``combine_results.py`` rename maps).
METRIC_RENAMES = {
    'rmse': 'RMSE',
    'mse': 'MSE',
    'bias': 'Bias',
    'acc': 'ACC',
    'seeps': 'SEEPS',
    'vector_rmse': 'Vector RMSE',
    'prediction_activity': 'Activity',
    'crps': 'CRPS',
    'unbiased_spread_skill': 'Spread/Skill',
    'unbiased_mean_rmse': 'Ensemble-mean RMSE (unbiased)',
    'mean_rmse': 'Ensemble-mean RMSE',
}


def combine_model_results(
    model_files: Mapping[str, str],
) -> dict[str, DimArray]:
  """{model_name: metrics_file} → one '<variable>' dataset.

  Output arrays have dims (model, metric, *result_dims); metric values
  computed for different metrics of the same variable are stacked along a
  'metric' dim, models along 'model'.
  """
  per_model: dict[str, dict[str, dict[str, DimArray]]] = {}
  for model, path in model_files.items():
    ds = io_lib.load_dataset(path)
    by_var: dict[str, dict[str, DimArray]] = {}
    for key, da in ds.items():
      metric, var = str(key).split('.', 1)
      by_var.setdefault(var, {})[METRIC_RENAMES.get(metric, metric)] = da
    per_model[model] = by_var

  models = sorted(per_model)
  variables = sorted({v for m in per_model.values() for v in m})
  out: dict[str, DimArray] = {}
  for var in variables:
    metric_names = sorted({
        m for model in models for m in per_model[model].get(var, {})})
    model_stacks = []
    for model in models:
      stack = []
      for metric in metric_names:
        da = per_model[model].get(var, {}).get(metric)
        if da is None:
          # NaN fill for a (model, variable, metric) hole. The template
          # must come from the SAME (variable, metric) of another model:
          # a different metric can have extra dims (quantile, threshold)
          # and would mis-shape the stack. One always exists —
          # metric_names only contains metrics present under this
          # variable for at least one model.
          template = next(
              per_model[m][var][metric] for m in models
              if metric in per_model[m].get(var, {}))
          da = template.copy(data=np.full(template.shape, np.nan))
        stack.append(da)
      model_stacks.append(darray.concat(stack, 'metric').assign_coords(
          metric=Coord(('metric',), np.array(metric_names))))
    out[var] = darray.concat(model_stacks, 'model').assign_coords(
        model=Coord(('model',), np.array(models)))
  return out


def main(argv: Optional[Sequence[str]] = None) -> None:
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--results_dir', required=True,
                 help='Directory of per-model metric .npz files')
  p.add_argument('--output_path', required=True,
                 help='Combined scorecard output (.npz)')
  args = p.parse_args(argv)

  model_files = {}
  for fn in sorted(os.listdir(args.results_dir)):
    if fn.endswith('.npz'):
      model = fn.split('_vs_')[0]
      if model in model_files:
        print(f'WARNING: multiple result files for model {model!r}; '
              f'using {fn} and ignoring '
              f'{os.path.basename(model_files[model])}')
      model_files[model] = os.path.join(args.results_dir, fn)
  if not model_files:
    raise SystemExit(f'No .npz result files found in {args.results_dir}')
  combined = combine_model_results(model_files)
  io_lib.save_dataset(args.output_path, combined)
  print(f'Wrote scorecard with {len(combined)} variables, '
        f'{len(model_files)} models to {args.output_path}')


if __name__ == '__main__':
  main()
