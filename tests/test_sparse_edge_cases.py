"""Sparse edge cases through the full pipeline.

Mirrors the reference's Beam sparse edge-case suite
(``beam_pipeline_test.py:272-586``): differing station sets per chunk,
empty bins, missing inits, fully-empty chunks, mismatched non-dim coords —
each targets a specific failure mode of the outer-join/concat machinery.
"""

import os

import numpy as np
import pytest

from weatherbenchx_tpu import aggregation, binning
from weatherbenchx_tpu import time_chunks as tc
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.data import base as data_base
from weatherbenchx_tpu.metrics import deterministic
from weatherbenchx_tpu.parallel import pipeline as pl


class SyntheticSparseLoader(data_base.DataLoader):
  """Sparse loader with a programmable station list per (init, lead)."""

  def __init__(self, stations_for, value=280.0, **kwargs):
    super().__init__(**kwargs)
    self._stations_for = stations_for
    self._value = value

  def _load_chunk_from_source(self, init_times, lead_times=None):
    rows = []
    for it in init_times:
      for lt in lead_times:
        for s in self._stations_for(it, lt):
          rows.append((it, lt, s))
    n = len(rows)
    coords = {
        'init_time': Coord(('index',), np.array(
            [r[0] for r in rows], dtype='datetime64[ns]')
            if n else np.zeros(0, 'datetime64[ns]')),
        'lead_time': Coord(('index',), np.array(
            [r[1] for r in rows], dtype='timedelta64[ns]')
            if n else np.zeros(0, 'timedelta64[ns]')),
        'stationName': Coord(('index',), np.array(
            [r[2] for r in rows]) if n else np.zeros(0, '<U4')),
        'index': Coord(('index',), np.arange(n)),
    }
    rng = np.random.default_rng(abs(hash(str(rows))) % 2**32)
    data = self._value + rng.standard_normal(n)
    return {'t': DimArray(data, ('index',), coords)}


def _run(stations_pred, stations_tgt, init, lead, reduce_dims=('index',),
         bin_by=None, masked=False, init_chunk=1, lead_chunk=1):
  agg = aggregation.Aggregator(
      reduce_dims=list(reduce_dims), bin_by=bin_by or [], masked=masked)
  pipe = pl.EvaluationPipeline(
      metrics={'mse': deterministic.MSE()},
      aggregator=agg,
      predictions_loader=SyntheticSparseLoader(stations_pred, value=281.0),
      targets_loader=SyntheticSparseLoader(stations_tgt, add_nan_mask=masked),
      times=tc.TimeChunks(init, lead, init_time_chunk_size=init_chunk,
                          lead_time_chunk_size=lead_chunk))
  state = pipe.run()
  return state, state.metric_values({'mse': deterministic.MSE()})


INIT = np.array(['2020-01-01T00', '2020-01-01T12'], dtype='datetime64[ns]')
LEAD = np.array([6, 12], dtype='timedelta64[h]').astype('timedelta64[ns]')


class TestSparseEdgeCases:
  def test_differing_station_sets_per_lead(self):
    """Station sets differ per lead — station binning outer-joins exactly."""
    def stations(it, lt):
      hours = lt.astype('timedelta64[h]').astype(int)
      return ['AAA', 'BBB'] if hours == 6 else ['BBB', 'CCC']

    state, values = _run(
        stations, stations, INIT, LEAD,
        bin_by=[binning.BySets(
            {'AAA': ['AAA'], 'BBB': ['BBB'], 'CCC': ['CCC']},
            'stationName', bin_dim_name='station_bin')])
    out = values['mse.t']
    assert out.dims == ('station_bin',)
    # Every station has data from at least one lead: all finite.
    assert np.isfinite(np.asarray(out.values)).all()
    # Weight bookkeeping: AAA appears in 2 chunks (lead 6 per init),
    # BBB in 4, CCC in 2.
    w = np.asarray(state.sum_weights['SquaredError']['t'].values)
    np.testing.assert_allclose(w, [2, 4, 2])

  def test_empty_bins_give_nan(self):
    def stations(it, lt):
      return ['AAA']

    state, values = _run(
        stations, stations, INIT, LEAD,
        bin_by=[binning.BySets(
            {'AAA': ['AAA'], 'ZZZ': ['ZZZ']}, 'stationName',
            bin_dim_name='station_bin')])
    out = np.asarray(values['mse.t'].values)
    assert np.isfinite(out[0])
    assert np.isnan(out[1])  # empty bin -> 0/0 -> NaN

  def test_missing_init(self):
    """One init has no observations at all; its chunks contribute nothing."""
    def stations_tgt(it, lt):
      if it == INIT[1]:
        return []
      return ['AAA', 'BBB']

    state, values = _run(stations_tgt, stations_tgt, INIT, LEAD)
    assert np.isfinite(values['mse.t'].item())
    # Weights only from the present init: 2 stations x 2 leads.
    assert state.sum_weights['SquaredError']['t'].item() == pytest.approx(4.0)

  def test_fully_empty_data(self):
    def stations(it, lt):
      return []

    state, values = _run(stations, stations, INIT, LEAD)
    # 0/0 -> NaN metric, no crash.
    assert np.isnan(values['mse.t'].item())

  def test_preserved_station_coord_outer_join(self):
    """reduce over nothing: per-index results concat across ragged chunks."""
    def stations(it, lt):
      hours = lt.astype('timedelta64[h]').astype(int)
      return ['AAA'] if hours == 6 else ['AAA', 'BBB']

    # Bin by exact station name so results are per-station (reduce index).
    state, values = _run(
        stations, stations, INIT, LEAD,
        bin_by=[binning.BySets({'AAA': ['AAA'], 'BBB': ['BBB']},
                               'stationName', bin_dim_name='sb')])
    w = np.asarray(state.sum_weights['SquaredError']['t'].values)
    np.testing.assert_allclose(w, [4, 2])  # AAA in all 4 chunks, BBB in 2

  def test_masked_nan_observations(self):
    """NaN observations masked out via the loader's nan mask."""
    class NaNLoader(SyntheticSparseLoader):
      def _load_chunk_from_source(self, init_times, lead_times=None):
        out = super()._load_chunk_from_source(init_times, lead_times)
        da = out['t']
        v = np.asarray(da.values).copy()
        if v.size:
          v[0] = np.nan  # first obs of each chunk is bad
        out['t'] = da.copy(data=v)
        return out

    def stations(it, lt):
      return ['AAA', 'BBB', 'CCC']

    agg = aggregation.Aggregator(reduce_dims=['index'], masked=True)
    pipe = pl.EvaluationPipeline(
        metrics={'mse': deterministic.MSE()},
        aggregator=agg,
        predictions_loader=SyntheticSparseLoader(stations, value=281.0),
        targets_loader=NaNLoader(stations, add_nan_mask=True),
        times=tc.TimeChunks(INIT, LEAD, init_time_chunk_size=1,
                            lead_time_chunk_size=1))
    state = pipe.run()
    values = state.metric_values({'mse': deterministic.MSE()})
    assert np.isfinite(values['mse.t'].item())
    # 4 chunks x 2 valid (of 3) observations.
    assert state.sum_weights['SquaredError']['t'].item() == pytest.approx(8.0)
