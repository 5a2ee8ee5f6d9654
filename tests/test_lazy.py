"""Lazy windowed-read tests: composition correctness + bounded chunk I/O.

The streaming contract (reference lazy-Zarr open + per-chunk compute,
``data_loaders/base.py:146-153``): stores open without materializing,
selections compose metadata, and each chunk's materialization reads only
its own window from disk.
"""

import numpy as np
import pytest

from weatherbenchx_tpu import io as io_lib
from weatherbenchx_tpu import lazy
from weatherbenchx_tpu import time_chunks as time_chunks_lib
from weatherbenchx_tpu.darray import DimArray
from weatherbenchx_tpu.data import loaders


def _store(path, n_time=64, n_lat=9, n_lon=12, seed=3):
  rng = np.random.default_rng(seed)
  t = (np.datetime64('2020-01-01', 'ns')
       + np.arange(n_time) * np.timedelta64(6, 'h'))
  ds = {
      't2m': DimArray(
          rng.standard_normal((n_time, n_lat, n_lon)).astype(np.float32),
          ('valid_time', 'latitude', 'longitude'),
          {'valid_time': t,
           'latitude': np.linspace(-90, 90, n_lat),
           'longitude': np.linspace(0, 360, n_lon, endpoint=False)}),
  }
  io_lib.save_dataset(path, ds)
  return ds, t


class TestLazyArrayComposition:
  @pytest.mark.parametrize('ext', ['npz', 'wbx'])
  def test_random_index_chains_match_numpy(self, tmp_path, ext):
    path = str(tmp_path / f's.{ext}')
    ds, _ = _store(path)
    want_full = ds['t2m'].values
    lz = io_lib.open_dataset(path)['t2m'].data
    rng = np.random.default_rng(7)
    for _ in range(25):
      want = want_full
      got = lz
      for _ in range(rng.integers(1, 4)):
        if got.ndim == 0:
          break
        ax = int(rng.integers(0, got.ndim))
        n = got.shape[ax]
        kind = rng.integers(0, 3)
        if kind == 0:
          lo = int(rng.integers(0, n))
          hi = int(rng.integers(lo, n + 1))
          idx = slice(lo, hi)
        elif kind == 1:
          idx = rng.integers(0, n, size=int(rng.integers(1, n + 1)))
        else:
          idx = int(rng.integers(0, n))
        key = (slice(None),) * ax + (idx,)
        want = want[key]
        got = got[key]
      np.testing.assert_array_equal(np.asarray(got), want)

  def test_negative_and_strided(self, tmp_path):
    path = str(tmp_path / 's.wbx')
    ds, _ = _store(path)
    a = ds['t2m'].values
    lz = io_lib.open_dataset(path)['t2m'].data
    np.testing.assert_array_equal(np.asarray(lz[::-1]), a[::-1])
    np.testing.assert_array_equal(np.asarray(lz[::3, ::2]), a[::3, ::2])
    np.testing.assert_array_equal(
        np.asarray(lz[np.array([-1, 0, -2])]), a[np.array([-1, 0, -2])])
    np.testing.assert_array_equal(np.asarray(lz[5:2]), a[5:2])

  def test_compressed_npz_falls_back_eager(self, tmp_path):
    path = str(tmp_path / 'c.npz')
    arr = np.arange(24, dtype=np.float32).reshape(4, 6)
    meta, arrays = io_lib._collect(
        {'x': DimArray(arr, ('a', 'b'),
                       {'a': np.arange(4), 'b': np.arange(6)})})
    import json
    arrays['__meta__'] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)
    opened = io_lib.open_dataset(path)['x']
    assert isinstance(opened.data.source, lazy.EagerSource)
    np.testing.assert_array_equal(np.asarray(opened.data[1:3]), arr[1:3])


class TestWindowedChunkReads:
  """Per-chunk materialization must read only that chunk's window."""

  def _spy_bytes(self, monkeypatch):
    counted = {'n': 0}
    orig = lazy.BlockSource._pread_runs
    def spy(self, runs, flat, itemsize):
      counted['n'] += sum(n for _, _, n in runs) * itemsize
      return orig(self, runs, flat, itemsize)
    monkeypatch.setattr(lazy.BlockSource, '_pread_runs', spy)
    return counted

  @pytest.mark.parametrize('ext', ['npz', 'wbx'])
  def test_targets_loader_reads_only_chunk_window(
      self, tmp_path, monkeypatch, ext):
    path = str(tmp_path / f's.{ext}')
    ds, t = _store(path, n_time=64)
    loader = loaders.TargetsFromDataset(path=path, rename_dimensions=None)
    loader.maybe_prepare_dataset()  # open first: coords read eagerly here
    counted = self._spy_bytes(monkeypatch)
    init_times = t[:8]
    lead_times = np.array([0, 6], 'timedelta64[h]').astype('timedelta64[ns]')
    chunk = loader.load_chunk(init_times, lead_times)

    # 8 inits × 2 leads (overlapping valid times) on a 64-time store:
    # the gather reads 16 rows, not 64.
    row = ds['t2m'].values[0].nbytes
    assert counted['n'] == 16 * row
    da = chunk['t2m']
    assert isinstance(da.data, np.ndarray)  # chunk is materialized
    np.testing.assert_array_equal(
        da.isel(init_time=3, lead_time=1).values,
        ds['t2m'].sel(valid_time=init_times[3] + lead_times[1]).values)

  def test_full_evaluation_from_lazy_store_matches_eager(self, tmp_path):
    from weatherbenchx_tpu import aggregation, weighting
    from weatherbenchx_tpu.metrics import deterministic
    from weatherbenchx_tpu.parallel import pipeline as pipeline_lib

    tpath = str(tmp_path / 'tgt.wbx')
    tgt_ds, t = _store(tpath, n_time=24)
    rng = np.random.default_rng(5)
    init_times = t[:16]
    lead_times = np.array([0, 6], 'timedelta64[h]').astype('timedelta64[ns]')
    pred_ds = {'t2m': DimArray(
        rng.standard_normal((16, 2, 9, 12)).astype(np.float32),
        ('init_time', 'lead_time', 'latitude', 'longitude'),
        {'init_time': init_times, 'lead_time': lead_times,
         'latitude': np.linspace(-90, 90, 9),
         'longitude': np.linspace(0, 360, 12, endpoint=False)})}
    ppath = str(tmp_path / 'pred.wbx')
    io_lib.save_dataset(ppath, pred_ds)

    metrics = {'rmse': deterministic.RMSE()}
    agg = aggregation.Aggregator(
        reduce_dims=['init_time', 'latitude', 'longitude'],
        weigh_by=[weighting.GridAreaWeighting()])
    times = time_chunks_lib.TimeChunks(
        init_times, lead_times, init_time_chunk_size=4)

    def run(ploader, tloader):
      return pipeline_lib.evaluate(
          metrics, agg, predictions_loader=ploader,
          targets_loader=tloader, times=times)

    lazy_vals = run(
        loaders.PredictionsFromDataset(path=ppath, rename_dimensions=None),
        loaders.TargetsFromDataset(path=tpath, rename_dimensions=None))
    eager_vals = run(
        loaders.PredictionsFromDataset(ds=pred_ds, rename_dimensions=None),
        loaders.TargetsFromDataset(ds=tgt_ds, rename_dimensions=None))
    for k in eager_vals:
      np.testing.assert_allclose(
          np.asarray(lazy_vals[k].values),
          np.asarray(eager_vals[k].values), atol=1e-6)

  def test_sel_kwargs_compose_without_reading(self, tmp_path, monkeypatch):
    path = str(tmp_path / 's.wbx')
    _store(path, n_time=32)
    counted = self._spy_bytes(monkeypatch)
    loader = loaders.TargetsFromDataset(
        path=path, rename_dimensions=None,
        sel_kwargs={'latitude': slice(-30, 30)})
    loader.maybe_prepare_dataset()
    # Prepare reads coordinates (tiny) but must not touch variable data
    # (13824 bytes here).
    assert counted['n'] < 2048


class TestDescendingCoordSel:
  def test_label_slice_follows_coord_order(self):
    lats = np.linspace(90, -90, 7)
    da = DimArray(np.arange(7, dtype=np.float32), ('latitude',),
                  {'latitude': lats})
    got = da.sel(latitude=slice(60, -30))
    np.testing.assert_array_equal(
        got.coord_values('latitude'), lats[(lats <= 60) & (lats >= -30)])
    asc = da.sortby('latitude').sel(latitude=slice(-30, 60))
    np.testing.assert_array_equal(
        np.sort(asc.coord_values('latitude')),
        np.sort(got.coord_values('latitude')))
