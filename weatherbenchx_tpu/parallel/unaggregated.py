"""Unaggregated statistics pipeline: stream raw per-point statistics out.

The TPU equivalent of the reference's ``define_unaggregated_pipeline``
(``beam_pipeline.py:610-681``), which rechunks per-chunk statistics into a
Zarr store via xarray_beam. Here each chunk's statistics are computed in
the same jitted step and written as npz shards into a directory store with
chunk offsets; ``load_unaggregated`` (or any shard-aware reader) assembles
the full '<stat>.<var>' arrays. When xarray+zarr are installed the
assembled dataset can be exported with ``io.to_xarray_dataset``.
"""

import dataclasses
import json
import os
from typing import Hashable, Mapping, Optional

import jax

from weatherbenchx_tpu import aggregation as aggregation_lib
from weatherbenchx_tpu import io as io_lib
from weatherbenchx_tpu import time_chunks as time_chunks_lib
from weatherbenchx_tpu.darray import DimArray
from weatherbenchx_tpu.data import base as data_base
from weatherbenchx_tpu.metrics import base as metrics_base
from weatherbenchx_tpu.parallel import evaluator as evaluator_lib
from weatherbenchx_tpu.parallel import pipeline as pipeline_lib


@dataclasses.dataclass
class UnaggregatedPipeline:
  """Computes per-chunk statistics and streams them to a sharded store."""

  metrics: Mapping[str, metrics_base.Metric]
  predictions_loader: data_base.DataLoader
  targets_loader: data_base.DataLoader
  times: time_chunks_lib.TimeChunks
  out_path: str
  prefetch: int = 2

  def __post_init__(self):
    self._stats_fn = jax.jit(self._compute_stats)
    self._host_coords: tuple = ()
    self._unique_stats = evaluator_lib._unique_stats(self.metrics)

  def _compute_stats(self, predictions, targets):
    return metrics_base.compute_unique_statistics_for_all_metrics(
        self.metrics, predictions, targets)

  def run(self) -> str:
    """Evaluates all chunks, writing one npz shard per chunk + manifest."""
    os.makedirs(self.out_path, exist_ok=True)
    loader = pipeline_lib.EvaluationPipeline(
        metrics=self.metrics,
        aggregator=aggregation_lib.Aggregator(reduce_dims=()),
        predictions_loader=self.predictions_loader,
        targets_loader=self.targets_loader,
        times=self.times, prefetch=self.prefetch)
    manifest = {'version': 1, 'shards': []}
    for i, offsets, (predictions, targets) in loader._chunk_stream():
      p = evaluator_lib.prepare_chunk(
          predictions, self._unique_stats, is_predictions=True,
          targets=targets)
      t = evaluator_lib.prepare_chunk(targets)
      # One transfer for the whole pair (a transfer per leaf is a round
      # trip each on remote-attached accelerators).
      p, t = jax.device_put((p, t))
      stats = self._stats_fn(p, t)
      flat = {}
      for stat_name, stat_vars in stats.items():
        for var_name, da in stat_vars.items():
          flat[f'{stat_name}.{var_name}'] = (
              evaluator_lib.restore_time_coords(da))
      shard = f'chunk_{i:06d}.wbx'
      io_lib.save_dataset(os.path.join(self.out_path, shard), flat)
      manifest['shards'].append({
          'path': shard,
          'init_time_offset': offsets.init_time,
          'lead_time_offset': offsets.lead_time,
      })
    tmp = os.path.join(self.out_path, 'manifest.json.tmp')
    with open(tmp, 'w') as f:
      json.dump(manifest, f)
    os.replace(tmp, os.path.join(self.out_path, 'manifest.json'))
    return self.out_path


def load_unaggregated(path: str) -> dict[str, DimArray]:
  """Assembles the sharded unaggregated statistics into full arrays."""
  from weatherbenchx_tpu import darray

  with open(os.path.join(path, 'manifest.json')) as f:
    manifest = json.load(f)
  shards = sorted(manifest['shards'],
                  key=lambda s: (s['init_time_offset'],
                                 s['lead_time_offset']))
  # Group shards into rows by init offset, concat leads, then concat inits.
  by_init: dict[int, list] = {}
  for s in shards:
    by_init.setdefault(s['init_time_offset'], []).append(
        io_lib.load_dataset(os.path.join(path, s['path'])))

  out: dict[str, DimArray] = {}
  first_row = next(iter(by_init.values()))
  for key in first_row[0].keys():
    rows = []
    for init_offset in sorted(by_init):
      row = [ds[key] for ds in by_init[init_offset]]
      if len(row) > 1 and 'lead_time' in row[0].dims:
        rows.append(darray.concat(row, 'lead_time'))
      else:
        rows.append(row[0])
    if len(rows) > 1 and 'init_time' in rows[0].dims:
      out[key] = darray.concat(rows, 'init_time')
    else:
      out[key] = rows[0]
  return out


def define_unaggregated_pipeline(
    metrics: Mapping[str, metrics_base.Metric],
    predictions_loader: data_base.DataLoader,
    targets_loader: data_base.DataLoader,
    times: time_chunks_lib.TimeChunks,
    out_path: str,
    **kwargs,
) -> str:
  """One-call unaggregated run (the reference API's entry-point shape)."""
  return UnaggregatedPipeline(
      metrics=metrics, predictions_loader=predictions_loader,
      targets_loader=targets_loader, times=times, out_path=out_path,
      **kwargs).run()
