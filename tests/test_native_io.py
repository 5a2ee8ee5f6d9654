"""Native blockstore + .wbx container tests."""

import time

import numpy as np
import pytest

from weatherbenchx_tpu import io as io_lib, native
from weatherbenchx_tpu.darray import Coord, DimArray


def _dataset(seed=0, nbytes_big=4_000_000):
  rng = np.random.default_rng(seed)
  n = nbytes_big // 4
  times = np.arange('2020-01-01', '2020-01-05', dtype='datetime64[D]'
                    ).astype('datetime64[ns]')
  return {
      'big': DimArray(rng.standard_normal(n).astype(np.float32), ('x',)),
      'small': DimArray(
          np.arange(4.0), ('time',),
          {'time': times,
           'station': Coord(('time',), np.array(['a', 'bb', 'ccc', 'd']))}),
      'empty': DimArray(np.zeros((0, 3)), ('index', 'k')),
  }


class TestWbxContainer:
  def test_native_builds(self):
    import os
    if os.environ.get('WBX_NO_NATIVE') == '1':
      pytest.skip('native cores disabled for this run (WBX_NO_NATIVE=1)')
    assert native.available(), 'native blockstore failed to build'

  def test_roundtrip_native(self, tmp_path):
    ds = _dataset()
    path = str(tmp_path / 'data.wbx')
    io_lib.save_dataset(path, ds)
    out = io_lib.load_dataset(path)
    np.testing.assert_array_equal(out['big'].values, ds['big'].values)
    np.testing.assert_array_equal(
        out['small'].coord_values('station'), ['a', 'bb', 'ccc', 'd'])
    assert out['small'].coord_values('time').dtype.kind == 'M'
    assert out['empty'].shape == (0, 3)

  def test_python_fallback_reads_native_file(self, tmp_path, monkeypatch):
    ds = _dataset(seed=1)
    path = str(tmp_path / 'data.wbx')
    io_lib.save_dataset(path, ds)  # native write
    monkeypatch.setattr(native, 'available', lambda: False)
    out = io_lib.load_dataset(path)  # python read of same format
    np.testing.assert_array_equal(out['big'].values, ds['big'].values)

  def test_native_reads_python_file(self, tmp_path, monkeypatch):
    ds = _dataset(seed=2)
    path = str(tmp_path / 'data.wbx')
    monkeypatch.setattr(native, 'available', lambda: False)
    io_lib.save_dataset(path, ds)  # python write
    monkeypatch.undo()
    out = io_lib.load_dataset(path)  # native read
    np.testing.assert_array_equal(out['big'].values, ds['big'].values)

  def test_autodetect_without_extension(self, tmp_path):
    ds = _dataset(seed=3)
    path = str(tmp_path / 'data.wbx')
    io_lib.save_dataset(path, ds)
    import shutil
    noext = str(tmp_path / 'renamed.bin')
    shutil.copy(path, noext)
    out = io_lib.load_dataset(noext)  # magic sniffing
    np.testing.assert_array_equal(out['big'].values, ds['big'].values)

  def test_not_wbx_raises(self, tmp_path):
    path = str(tmp_path / 'bogus.wbx')
    with open(path, 'wb') as f:
      f.write(b'NOTMAGIC' + b'\x00' * 100)
    with pytest.raises(ValueError, match='not a .wbx container'):
      io_lib.load_dataset_wbx(path)

  def test_aggregation_state_wbx(self, tmp_path):
    from weatherbenchx_tpu import aggregation, test_utils
    from weatherbenchx_tpu.metrics import deterministic

    preds, tgts = test_utils.canonical_forecast_pair(seed=4)
    agg = aggregation.Aggregator(reduce_dims=['latitude', 'longitude'])
    from weatherbenchx_tpu.metrics import base as mbase
    stats = mbase.compute_unique_statistics_for_all_metrics(
        {'rmse': deterministic.RMSE()}, preds, tgts)
    state = agg.aggregate_statistics(stats)
    path = str(tmp_path / 'state.wbx')
    state.save(path)
    state2 = aggregation.AggregationState.load(path)
    np.testing.assert_allclose(
        np.asarray(state2.sum_weights['SquaredError'][
            '2m_temperature'].values),
        np.asarray(state.sum_weights['SquaredError'][
            '2m_temperature'].values))

  def test_faster_than_npz_for_large_arrays(self, tmp_path):
    rng = np.random.default_rng(0)
    ds = {f'v{i}': DimArray(
        rng.standard_normal(6_000_000 // 4).astype(np.float32), ('x',))
        for i in range(8)}  # 8 × 6MB
    wbx, npz = str(tmp_path / 'a.wbx'), str(tmp_path / 'a.npz')

    def best_of(fn, n=3):
      times = []
      for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
      return min(times)

    t_wbx = best_of(lambda: io_lib.save_dataset(wbx, ds), n=5)
    t_npz = best_of(lambda: io_lib.save_dataset(npz, ds), n=5)
    # Not a strict benchmark on shared CI (other processes can steal the
    # CPU mid-timing), but the parallel raw path should not lose to
    # zip+CRC by any real margin.
    assert t_wbx < t_npz * 1.3, (t_wbx, t_npz)
    r_wbx = best_of(lambda: io_lib.load_dataset(wbx), n=5)
    r_npz = best_of(lambda: io_lib.load_dataset(npz), n=5)
    assert r_wbx < r_npz * 1.5, (r_wbx, r_npz)


def test_loads_dataset_parses_wbx_bytes(tmp_path):
  """fileio.load_dataset_any on a remote .wbx fetches whole-object bytes;
  loads_dataset must parse the block container (not feed it to the npz
  parser and fail with a misleading pickle error)."""
  from weatherbenchx_tpu import io as io_lib
  from weatherbenchx_tpu.darray import Coord, DimArray
  ds = {'v': DimArray(np.arange(12, dtype=np.float32).reshape(3, 4),
                      ('t', 'x'),
                      {'t': Coord(('t',), np.arange(3)),
                       'x': Coord(('x',), np.arange(4))})}
  path = str(tmp_path / 'blob.wbx')
  io_lib.save_dataset(path, ds)
  out = io_lib.loads_dataset(open(path, 'rb').read())
  np.testing.assert_array_equal(np.asarray(out['v'].values),
                                np.asarray(ds['v'].values))
  # Arrays are writable (decoupled from the source bytes).
  np.asarray(out['v'].values)[0, 0] = -1.0


def test_wbx_python_fallback_returns_writable_arrays(tmp_path, monkeypatch):
  """The pure-Python .wbx read path must match the native path's
  mutability contract (in-place updates of restored states)."""
  from weatherbenchx_tpu import io as io_lib, native
  from weatherbenchx_tpu.darray import Coord, DimArray
  ds = {'v': DimArray(np.arange(6, dtype=np.float64), ('x',),
                      {'x': Coord(('x',), np.arange(6))})}
  path = str(tmp_path / 'w.wbx')
  io_lib.save_dataset(path, ds)
  monkeypatch.setattr(native, 'available', lambda: False)
  out = io_lib.load_dataset_wbx(path)
  arr = np.asarray(out['v'].values)
  assert arr.flags.writeable
  arr += 1.0
  np.testing.assert_array_equal(arr, np.arange(6, dtype=np.float64) + 1)
