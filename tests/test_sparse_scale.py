"""Sparse pad-to-bucket policy: bounded XLA compilations + value parity.

VERDICT r2 item 4: the jitted evaluation step must not retrace per chunk
when sparse chunks are ragged. ``DataLoader(pad_index_multiple=...)``
buckets the index dim; this test streams a month-like sequence of
varying-size chunks and asserts (a) the number of distinct compiled
programs stays bounded by the bucket count, (b) padded results equal the
unpadded ground truth (padded rows are masked out).
"""

import numpy as np
import pytest

from weatherbenchx_tpu import aggregation, binning
from weatherbenchx_tpu import time_chunks as tc
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.data import base as data_base
from weatherbenchx_tpu.metrics import deterministic
from weatherbenchx_tpu.parallel import pipeline as pl

INIT = (np.datetime64('2020-01-01', 'ns')
        + np.arange(16) * np.timedelta64(12, 'h'))
LEAD = np.array([6, 12], dtype='timedelta64[h]').astype('timedelta64[ns]')


class VaryingSparseLoader(data_base.DataLoader):
  """Station count varies per init chunk (ragged index dim)."""

  def __init__(self, offset=0.0, **kwargs):
    super().__init__(**kwargs)
    self._offset = offset

  def _load_chunk_from_source(self, init_times, lead_times=None):
    rows = []
    for it in init_times:
      h = int((it - INIT[0]) // np.timedelta64(12, 'h'))
      n_st = 120 + 37 * (h % 5)  # 120..268 stations, varies per chunk
      for lt in lead_times:
        for s in range(n_st):
          rows.append((it, lt, f'S{s:04d}'))
    n = len(rows)
    coords = {
        'init_time': Coord(('index',), np.array(
            [r[0] for r in rows], dtype='datetime64[ns]')),
        'lead_time': Coord(('index',), np.array(
            [r[1] for r in rows], dtype='timedelta64[ns]')),
        'stationName': Coord(('index',), np.array([r[2] for r in rows])),
        'index': Coord(('index',), np.arange(n)),
    }
    rng = np.random.default_rng(n * 7 + int(self._offset))
    data = (280.0 + self._offset
            + rng.standard_normal(n)).astype(np.float32)
    return {'t': DimArray(data, ('index',), coords)}


def _run(pad_multiple, init_chunk=2):
  metrics = {'mse': deterministic.MSE(), 'bias': deterministic.Bias()}
  agg = aggregation.Aggregator(
      reduce_dims=['index'], masked=True,
      bin_by=[binning.ByExactCoord('lead_time')])
  pipe = pl.EvaluationPipeline(
      metrics=metrics, aggregator=agg,
      predictions_loader=VaryingSparseLoader(
          offset=1.0, pad_index_multiple=pad_multiple),
      targets_loader=VaryingSparseLoader(
          add_nan_mask=True, pad_index_multiple=pad_multiple),
      times=tc.TimeChunks(INIT, LEAD, init_time_chunk_size=init_chunk,
                          lead_time_chunk_size=2))
  state = pipe.run()
  values = state.metric_values(metrics)
  compiles = pipe._evaluator.trace_count
  return values, compiles


class TestPadBucketPolicy:

  def test_bounded_compilations_and_value_parity(self):
    # Unpadded: every distinct chunk size is one compile (8 chunks here).
    unpadded, unpadded_compiles = _run(pad_multiple=None)
    # Padded to 1024: chunk sizes 480..1072 -> buckets {1024, 2048}.
    padded, padded_compiles = _run(pad_multiple=1024)
    assert padded_compiles <= 2, padded_compiles
    assert unpadded_compiles >= 4, unpadded_compiles  # proves raggedness
    for k in unpadded:
      a = np.asarray(unpadded[k].transpose(*padded[k].dims).values,
                     np.float64)
      b = np.asarray(padded[k].values, np.float64)
      np.testing.assert_allclose(b, a, atol=1e-5, err_msg=k)

  def test_padded_rows_masked_out(self):
    loader = VaryingSparseLoader(add_nan_mask=True, pad_index_multiple=512)
    chunk = loader.load_chunk(INIT[:1], LEAD)
    da = chunk['t']
    assert da.sizes['index'] == 512
    mask = np.asarray(da.coords['mask'].values)
    n_real = 120 * len(LEAD)
    assert mask[:n_real].all() and not mask[n_real:].any()
    assert np.isnan(np.asarray(da.values)[n_real:]).all()
