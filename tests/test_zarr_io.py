"""Self-contained Zarr v2 store tests: round-trip, lazy windows, layout.

The store layout must match what xarray+zarr produce/consume (reference
input stores and the unaggregated pipeline's output,
``beam_pipeline.py:610-681``): v2 metadata, ``_ARRAY_DIMENSIONS``, CF time
encoding, full-extent edge chunks, consolidated metadata.
"""

import json
import os

import numpy as np
import pytest

from weatherbenchx_tpu import io as io_lib
from weatherbenchx_tpu import lazy, zarr_io
from weatherbenchx_tpu.darray import Coord, DimArray


def _dataset(n_time=10, n_lat=7, n_lon=8, seed=0):
  rng = np.random.default_rng(seed)
  t = (np.datetime64('2020-01-01', 'ns')
       + np.arange(n_time) * np.timedelta64(6, 'h'))
  lead = (np.arange(3) * np.timedelta64(12, 'h')).astype('timedelta64[ns]')
  coords = {'valid_time': t,
            'latitude': np.linspace(-90, 90, n_lat),
            'longitude': np.linspace(0, 360, n_lon, endpoint=False)}
  da = DimArray(rng.standard_normal((n_time, n_lat, n_lon)).astype(np.float32),
                ('valid_time', 'latitude', 'longitude'), coords)
  aux = da.assign_coords(step=Coord(('valid_time',), lead.repeat(4)[:n_time]))
  return {'t2m': aux, 'z500': da.copy(data=(da.values * 2).astype(np.float32))}


class TestZarrRoundTrip:
  @pytest.mark.parametrize('compressor', [None, 'zlib'])
  def test_roundtrip(self, tmp_path, compressor):
    ds = _dataset()
    path = str(tmp_path / 'store.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 4},
                              compressor=compressor)
    back = zarr_io.open_dataset_zarr(path)
    assert set(back) == set(ds)
    for k, da in ds.items():
      got = back[k]
      assert got.dims == da.dims
      np.testing.assert_array_equal(np.asarray(got.data), da.values)
      for cname, c in da.coords.items():
        np.testing.assert_array_equal(
            np.asarray(got.coords[cname].values), np.asarray(c.values))
        assert got.coords[cname].values.dtype == np.asarray(c.values).dtype

  @pytest.mark.parametrize('compressor', [None, 'blosc', 'zstd', 'gzip'])
  def test_v3_write_roundtrip(self, tmp_path, compressor):
    """v3 write → the self-contained v3 reader (which the r4 fixtures
    validated against zarr-python-written stores) round-trips values,
    dims, coord dtypes, and ragged edge chunks."""
    ds = _dataset()
    path = str(tmp_path / 'store_v3.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 4},
                              compressor=compressor, zarr_format=3)
    back = zarr_io.open_dataset_zarr(path)
    assert set(back) == set(ds)
    for k, da in ds.items():
      got = back[k]
      assert got.dims == da.dims
      np.testing.assert_array_equal(np.asarray(got.data), da.values)
      for cname, c in da.coords.items():
        np.testing.assert_array_equal(
            np.asarray(got.coords[cname].values), np.asarray(c.values))
        assert got.coords[cname].values.dtype == np.asarray(c.values).dtype

  def test_v3_write_layout(self, tmp_path):
    """The on-disk v3 layout matches the spec surface zarr-python reads:
    root zarr.json, per-array zarr.json with regular grid + bytes codec +
    dimension_names, and c/-prefixed chunk keys."""
    ds = _dataset(n_time=6)
    path = str(tmp_path / 'store_v3.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 4},
                              compressor='blosc', zarr_format=3)
    root = json.loads(open(os.path.join(path, 'zarr.json')).read())
    assert root == {'zarr_format': 3, 'node_type': 'group',
                    'attributes': {}}
    meta = json.loads(open(os.path.join(path, 't2m', 'zarr.json')).read())
    assert meta['node_type'] == 'array'
    assert meta['data_type'] == 'float32'
    assert meta['fill_value'] == 'NaN'
    assert meta['chunk_grid'] == {
        'name': 'regular', 'configuration': {'chunk_shape': [4, 7, 8]}}
    assert meta['dimension_names'] == ['valid_time', 'latitude',
                                       'longitude']
    names = [c['name'] for c in meta['codecs']]
    assert names == ['bytes', 'blosc']
    assert meta['codecs'][1]['configuration']['typesize'] == 4
    assert os.path.exists(os.path.join(path, 't2m', 'c', '0', '0', '0'))
    assert os.path.exists(os.path.join(path, 't2m', 'c', '1', '0', '0'))
    assert not os.path.exists(os.path.join(path, '.zmetadata'))
    # time coord: CF-encoded int64 with units in attributes
    tmeta = json.loads(
        open(os.path.join(path, 'valid_time', 'zarr.json')).read())
    assert tmeta['data_type'] == 'int64'
    assert 'since' in tmeta['attributes']['units']

  def test_v3_write_rejects_strings_and_zlib(self, tmp_path):
    ds = {'v': DimArray(np.arange(3, dtype=np.float32), ('station',),
                        {'station': np.array(['a', 'b', 'c'])})}
    with pytest.raises(ValueError, match='v2-only'):
      zarr_io.save_dataset_zarr(str(tmp_path / 's1'), ds, zarr_format=3)
    ds2 = {'v': DimArray(np.arange(3, dtype=np.float32), ('x',))}
    with pytest.raises(ValueError, match='zarr v3'):
      zarr_io.save_dataset_zarr(str(tmp_path / 's2'), ds2,
                                compressor='zlib', zarr_format=3)

  def test_v3_write_bool_and_missing_chunk_fill(self, tmp_path):
    ds = {'flag': DimArray(np.arange(10) % 3 == 0, ('x',))}
    path = str(tmp_path / 'b.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'x': 4}, zarr_format=3)
    os.remove(os.path.join(path, 'flag', 'c', '1'))  # drop middle chunk
    back = zarr_io.open_dataset_zarr(path)
    got = np.asarray(back['flag'].data)
    assert got.dtype == np.bool_
    want = (np.arange(10) % 3 == 0)
    want[4:8] = False  # fill_value
    np.testing.assert_array_equal(got, want)

  def test_lazy_window_reads_only_needed_chunks(self, tmp_path, monkeypatch):
    ds = _dataset(n_time=16)
    path = str(tmp_path / 'store.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 2})
    opened = zarr_io.open_dataset_zarr(path)
    loads = []
    orig = zarr_io.ZarrChunkSource._load_cell
    monkeypatch.setattr(
        zarr_io.ZarrChunkSource, '_load_cell',
        lambda self, cell: loads.append(cell) or orig(self, cell))
    win = opened['t2m'].isel(valid_time=np.array([4, 5]))
    np.testing.assert_array_equal(
        np.asarray(win.data), ds['t2m'].values[[4, 5]])
    assert set(loads) == {(2, 0, 0)}  # times 4,5 live in time-chunk 2 only

  def test_store_layout_is_zarr_v2(self, tmp_path):
    ds = _dataset()
    path = str(tmp_path / 'store.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 4})
    with open(os.path.join(path, '.zgroup')) as f:
      assert json.load(f) == {'zarr_format': 2}
    with open(os.path.join(path, 't2m', '.zarray')) as f:
      zarray = json.load(f)
    assert zarray['chunks'] == [4, 7, 8]
    assert zarray['fill_value'] == 'NaN'
    with open(os.path.join(path, 't2m', '.zattrs')) as f:
      attrs = json.load(f)
    assert attrs['_ARRAY_DIMENSIONS'] == ['valid_time', 'latitude',
                                          'longitude']
    assert 'step' in attrs['coordinates'].split()
    # CF-encoded time coordinate.
    with open(os.path.join(path, 'valid_time', '.zattrs')) as f:
      tattrs = json.load(f)
    assert 'since' in tattrs['units']
    # Edge chunk stored at full extent: 10 times / chunk 4 -> 3 chunks.
    assert os.path.getsize(os.path.join(path, 't2m', '2.0.0')) == 4 * 7 * 8 * 4
    assert os.path.exists(os.path.join(path, '.zmetadata'))

  def test_loader_reads_zarr_store(self, tmp_path):
    from weatherbenchx_tpu.data import loaders
    ds = _dataset()
    path = str(tmp_path / 'store.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 4})
    loader = loaders.TargetsFromDataset(path=path, rename_dimensions=None)
    t = ds['t2m'].coord_values('valid_time')
    chunk = loader.load_chunk(
        t[:2], np.array([12], 'timedelta64[h]').astype('timedelta64[ns]'))
    np.testing.assert_array_equal(
        chunk['t2m'].isel(init_time=0, lead_time=0).values,
        ds['t2m'].sel(valid_time=t[0] + np.timedelta64(12, 'h')).values)

  def test_io_dispatch(self, tmp_path):
    ds = _dataset()
    path = str(tmp_path / 'store.zarr')
    io_lib.save_dataset(path, ds)
    back = io_lib.load_dataset(path)
    np.testing.assert_array_equal(
        np.asarray(back['z500'].values), ds['z500'].values)
    opened = io_lib.open_dataset(path)
    assert lazy.is_lazy(opened['z500'].data)

  def test_mismatched_shared_coord_raises(self, tmp_path):
    ds = _dataset()
    bad = dict(ds)
    bad['z500'] = ds['z500'].assign_coords(
        latitude=Coord(('latitude',), np.linspace(-80, 80, 7)))
    with pytest.raises(ValueError, match='latitude'):
      zarr_io.save_dataset_zarr(str(tmp_path / 'b.zarr'), bad)

  def test_scalar_and_string_arrays(self, tmp_path):
    ds = {'names': DimArray(
        np.array(['alpha', 'be'], dtype='<U5'), ('station',),
        {'station': np.arange(2), 'one': Coord((), np.float64(3.5))})}
    path = str(tmp_path / 's.zarr')
    zarr_io.save_dataset_zarr(path, ds)
    back = zarr_io.open_dataset_zarr(path)
    np.testing.assert_array_equal(
        np.asarray(back['names'].data), ds['names'].values)
    assert np.asarray(back['names'].coords['one'].values).item() == 3.5

  def test_fortran_order_store_rejected(self, tmp_path):
    """order='F' chunks would decode scrambled; the reader must refuse."""
    import json
    path = tmp_path / 'f.zarr'
    zarr_io.save_dataset_zarr(str(path), _dataset())
    zarray_path = path / 'z500' / '.zarray'
    meta = json.loads(zarray_path.read_text())
    meta['order'] = 'F'
    zarray_path.write_text(json.dumps(meta))
    (path / '.zmetadata').unlink()  # force per-array metadata reads
    with pytest.raises(ValueError, match='order'):
      ds = zarr_io.open_dataset_zarr(str(path))
      np.asarray(ds['z500'].data)


def test_float_cf_time_nan_decodes_to_nat():
  """NaN in float 'units since' time coords (xarray's NaT encoding) must
  decode to NaT, not fall through floor(NaN).astype(int64)."""
  from weatherbenchx_tpu.zarr_io import _decode_cf_time
  import warnings as _warnings
  for unit in ('nanoseconds', 'days'):
    vals = np.array([0.0, np.nan, 1.5])
    with _warnings.catch_warnings():
      _warnings.simplefilter('error')  # the raw NaN cast emits RuntimeWarning
      out = _decode_cf_time(vals, {'units': f'{unit} since 2020-01-01'})
    assert out.dtype.kind == 'M'
    assert out[0] == np.datetime64('2020-01-01', 'ns')
    assert np.isnat(out[1])


def test_shared_coord_with_nat_saves(tmp_path):
  """NaT == NaT for the coordinate-consistency check: a shared time coord
  with missing entries must not spuriously fail the save (cf.py)."""
  times = np.array(['2020-01-01', 'NaT', '2020-01-03'],
                   dtype='datetime64[ns]')
  mk = lambda seed: DimArray(
      np.random.default_rng(seed).standard_normal(3).astype(np.float32),
      ('valid_time',), {'valid_time': Coord(('valid_time',), times.copy())})
  root = str(tmp_path / 'nat.zarr')
  zarr_io.save_dataset_zarr(root, {'a': mk(1), 'b': mk(2)})
  ds = zarr_io.open_dataset_zarr(root)
  got = np.asarray(ds['a'].coords['valid_time'].values)
  assert np.isnat(got[1])
  np.testing.assert_array_equal(got.view('i8'), times.view('i8'))


def test_cf_time_int_overflow_raises():
  """Coarse-unit int CF times past the datetime64[ns] range must raise,
  not wrap into wrong-era timestamps."""
  from weatherbenchx_tpu.zarr_io import _decode_cf_time
  # ~year 2262 boundary: 9.3e9 seconds overflows int64 ns.
  vals = np.array([0, 10_000_000_000], dtype=np.int64)
  with pytest.raises(OverflowError):
    _decode_cf_time(vals, {'units': 'seconds since 1970-01-01'})
  # In-range values still decode exactly.
  ok = _decode_cf_time(np.array([0, 86400], dtype=np.int64),
                       {'units': 'seconds since 1970-01-01'})
  np.testing.assert_array_equal(
      ok, np.array(['1970-01-01', '1970-01-02'], dtype='datetime64[ns]'))
  # min-int64 is the NaT sentinel and passes through.
  nat = _decode_cf_time(np.array([np.iinfo(np.int64).min], dtype=np.int64),
                        {'units': 'days since 1970-01-01'})
  assert np.isnat(nat[0])


# ---------------------------------------------------------------------------
# zarr v3 read support
# ---------------------------------------------------------------------------


def _write_v3_store(root, arrays, *, codec=None, key_encoding='default',
                    separator=None, endian='little', shards=None,
                    index_location='end', skip_inner=(),
                    corrupt_index=False):
  """Hand-writes a spec-conformant zarr v3 directory store.

  ``arrays`` maps name -> (values, dims, chunks, extra_attrs). Written
  straight from the v3 core spec (zarr.json metadata, `c/`-prefixed chunk
  keys for the default encoding) so the reader is tested against
  independent bytes, not its own writer.

  ``shards`` (a shape, multiple of each array's chunks) switches on the
  ``sharding_indexed`` codec: chunk_grid becomes the shard grid, shard
  objects hold the encoded inner chunks plus a little-endian
  (offset, nbytes) index with a crc32c checksum, at ``index_location``.
  ``skip_inner`` inner-cell ids are omitted (index sentinel 2**64-1).
  """
  from weatherbenchx_tpu import codecs as wbx_codecs

  os.makedirs(root, exist_ok=True)
  with open(os.path.join(root, 'zarr.json'), 'w') as f:
    json.dump({'zarr_format': 3, 'node_type': 'group', 'attributes': {}}, f)
  sep = separator or ('/' if key_encoding == 'default' else '.')
  for name, (values, dims, chunks, extra_attrs) in arrays.items():
    values = np.asarray(values)
    adir = os.path.join(root, name)
    os.makedirs(adir, exist_ok=True)
    store_dtype = values.dtype.newbyteorder(
        '>' if endian == 'big' else '<') if values.dtype.itemsize > 1 \
        else values.dtype
    codecs_list = [{'name': 'bytes', 'configuration': {'endian': endian}}]
    if codec == 'blosc':
      codecs_list.append({'name': 'blosc', 'configuration': {
          'cname': 'lz4', 'clevel': 5, 'shuffle': 'shuffle',
          'typesize': values.dtype.itemsize, 'blocksize': 0}})
    elif codec == 'zstd':
      codecs_list.append({'name': 'zstd', 'configuration': {'level': 3}})
    elif codec == 'gzip':
      codecs_list.append({'name': 'gzip', 'configuration': {'level': 5}})
    use_shards = shards is not None and name not in ('valid_time',
                                                     'latitude', 'longitude')
    if use_shards:
      grid_chunks = list(shards)
      codecs_list = [{'name': 'sharding_indexed', 'configuration': {
          'chunk_shape': list(chunks),
          'codecs': codecs_list,
          'index_codecs': [
              {'name': 'bytes', 'configuration': {'endian': 'little'}},
              {'name': 'crc32c'}],
          'index_location': index_location,
      }}]
    else:
      grid_chunks = list(chunks)
    meta = {
        'zarr_format': 3,
        'node_type': 'array',
        'shape': list(values.shape),
        'data_type': values.dtype.name,
        'chunk_grid': {'name': 'regular',
                       'configuration': {'chunk_shape': grid_chunks}},
        'chunk_key_encoding': {'name': key_encoding,
                               'configuration': {'separator': sep}},
        'fill_value': 'NaN' if values.dtype.kind == 'f' else 0,
        'codecs': codecs_list,
        'attributes': dict(extra_attrs or {}),
        'dimension_names': list(dims),
    }
    with open(os.path.join(adir, 'zarr.json'), 'w') as f:
      json.dump(meta, f)

    def block_bytes(cell, chunks):
      window = tuple(slice(i * c, (i + 1) * c)
                     for i, c in zip(cell, chunks))
      block = values[window]
      if block.shape != tuple(chunks):  # edge chunks store full extent
        full = np.full(chunks, np.nan if values.dtype.kind == 'f' else 0,
                       values.dtype)
        full[tuple(slice(0, s) for s in block.shape)] = block
        block = full
      raw = np.ascontiguousarray(block.astype(store_dtype)).tobytes()
      return wbx_codecs.encode_cell(raw, codec, values.dtype.itemsize)

    def cell_key(cell):
      if key_encoding == 'default':
        return 'c' + ''.join(f'{sep}{i}' for i in cell) if cell else 'c'
      return sep.join(str(i) for i in cell) if cell else '0'

    if use_shards:
      shard_grid = [max(-(-s // c), 1)
                    for s, c in zip(values.shape, grid_chunks)]
      spc = [s // c for s, c in zip(grid_chunks, chunks)]
      for shard in np.ndindex(*shard_grid):
        entries = []
        payload = b''
        # Offsets are absolute within the shard object: a leading index
        # shifts every inner chunk by the index size.
        base = (16 * int(np.prod(spc)) + 4) if index_location == 'start' \
            else 0
        for within in np.ndindex(*spc):
          cell = tuple(s * n + w for s, n, w in zip(shard, spc, within))
          if cell in set(skip_inner) or any(
              i * c >= values.shape[d]
              for d, (i, c) in enumerate(zip(cell, chunks))):
            entries.append((2**64 - 1, 2**64 - 1))
            continue
          enc = block_bytes(cell, chunks)
          entries.append((base + len(payload), len(enc)))
          payload += enc
        index = np.asarray(entries, '<u8').tobytes()
        index += wbx_codecs.crc32c(index).to_bytes(4, 'little')
        if corrupt_index:
          index = index[:-1] + bytes([index[-1] ^ 0xFF])
        blob = (index + payload if index_location == 'start'
                else payload + index)
        path = os.path.join(adir, cell_key(shard))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, 'wb') as f:
          f.write(blob)
      continue

    grid = [max(-(-s // c), 1) for s, c in zip(values.shape, chunks)]
    for cell in np.ndindex(*grid):
      path = os.path.join(adir, cell_key(cell))
      os.makedirs(os.path.dirname(path), exist_ok=True)
      with open(path, 'wb') as f:
        f.write(block_bytes(cell, chunks))


def _v3_fixture_arrays(n_time=10, n_lat=5, n_lon=6):
  rng = np.random.default_rng(7)
  t_ints = (np.arange(n_time) * 6 * 3600 * 10**9).astype(np.int64)
  data = rng.standard_normal((n_time, n_lat, n_lon)).astype(np.float32)
  return data, {
      'valid_time': (t_ints, ('valid_time',), [4],
                     {'units': 'nanoseconds since 1970-01-01'}),
      'latitude': (np.linspace(-90, 90, n_lat), ('latitude',), [n_lat], {}),
      'longitude': (np.linspace(0, 360, n_lon, endpoint=False),
                    ('longitude',), [n_lon], {}),
      't2m': (data, ('valid_time', 'latitude', 'longitude'),
              [4, 3, 6], {}),
  }


class TestZarrV3Read:
  @pytest.mark.parametrize('codec', [None, 'blosc', 'zstd', 'gzip'])
  @pytest.mark.parametrize('key_encoding', ['default', 'v2'])
  def test_v3_store_reads(self, tmp_path, codec, key_encoding):
    data, arrays = _v3_fixture_arrays()
    root = str(tmp_path / 'v3.zarr')
    _write_v3_store(root, arrays, codec=codec, key_encoding=key_encoding)
    ds = zarr_io.open_dataset_zarr(root)
    da = ds['t2m']
    assert da.dims == ('valid_time', 'latitude', 'longitude')
    np.testing.assert_array_equal(np.asarray(da.values), data)
    tvals = np.asarray(da.coords['valid_time'].values)
    assert tvals.dtype.kind == 'M'
    assert tvals[1] - tvals[0] == np.timedelta64(6, 'h')
    # Lazy window read crosses chunk boundaries incl. the ragged lat edge.
    win = np.asarray(da.isel({'valid_time': slice(3, 9),
                              'latitude': slice(2, 5)}).values)
    np.testing.assert_array_equal(win, data[3:9, 2:5])

  def test_v3_default_dot_separator(self, tmp_path):
    data, arrays = _v3_fixture_arrays()
    root = str(tmp_path / 'v3dot.zarr')
    _write_v3_store(root, arrays, key_encoding='default', separator='.')
    ds = zarr_io.open_dataset_zarr(root)
    np.testing.assert_array_equal(np.asarray(ds['t2m'].values), data)

  def test_v3_big_endian(self, tmp_path):
    data, arrays = _v3_fixture_arrays()
    root = str(tmp_path / 'v3be.zarr')
    _write_v3_store(root, {'t2m': arrays['t2m']}, endian='big')
    ds = zarr_io.open_dataset_zarr(root)
    np.testing.assert_array_equal(
        np.asarray(ds['t2m'].values).astype(np.float32), data)

  def test_v3_missing_chunk_fills(self, tmp_path):
    data, arrays = _v3_fixture_arrays()
    root = str(tmp_path / 'v3fill.zarr')
    _write_v3_store(root, arrays)
    os.remove(os.path.join(root, 't2m', 'c', '0', '0', '0'))
    ds = zarr_io.open_dataset_zarr(root)
    got = np.asarray(ds['t2m'].values)
    assert np.isnan(got[:4, :3, :]).all()
    np.testing.assert_array_equal(got[4:], data[4:])

  def test_crc32c_known_vector(self):
    from weatherbenchx_tpu import codecs as wbx_codecs
    # RFC 3720 / the universal CRC-32C check value.
    assert wbx_codecs.crc32c(b'123456789') == 0xE3069283
    assert wbx_codecs.crc32c(b'') == 0

  @pytest.mark.parametrize('codec', [None, 'blosc', 'zstd'])
  @pytest.mark.parametrize('index_location', ['end', 'start'])
  def test_v3_sharded_store_reads(self, tmp_path, codec, index_location):
    data, arrays = _v3_fixture_arrays()
    root = str(tmp_path / 'v3shard.zarr')
    # 2x1x2 inner chunks per shard; time axis has a ragged final shard.
    _write_v3_store(root, arrays, codec=codec, shards=[8, 3, 12],
                    index_location=index_location)
    ds = zarr_io.open_dataset_zarr(root)
    da = ds['t2m']
    assert da.dims == ('valid_time', 'latitude', 'longitude')
    np.testing.assert_array_equal(np.asarray(da.values), data)
    # Windowed read touching two shards and inner-chunk interiors.
    win = np.asarray(da.isel({'valid_time': slice(3, 9),
                              'latitude': slice(2, 5),
                              'longitude': slice(1, 5)}).values)
    np.testing.assert_array_equal(win, data[3:9, 2:5, 1:5])

  def test_v3_sharded_missing_pieces_fill(self, tmp_path):
    data, arrays = _v3_fixture_arrays()
    root = str(tmp_path / 'v3shardfill.zarr')
    # Skip one inner chunk (index sentinel) and delete one whole shard.
    _write_v3_store(root, arrays, shards=[8, 3, 12],
                    skip_inner=[(0, 0, 0)])
    os.remove(os.path.join(root, 't2m', 'c', '1', '0', '0'))
    ds = zarr_io.open_dataset_zarr(root)
    got = np.asarray(ds['t2m'].values)
    assert np.isnan(got[:4, :3, :6]).all()   # sentinel inner chunk
    assert np.isnan(got[8:, :3, :]).all()    # missing shard object
    np.testing.assert_array_equal(got[4:8], data[4:8])
    np.testing.assert_array_equal(got[:8, 3:], data[:8, 3:])

  def test_v3_sharded_index_checksum_verified(self, tmp_path):
    data, arrays = _v3_fixture_arrays()
    root = str(tmp_path / 'v3shardbad.zarr')
    _write_v3_store(root, arrays, shards=[8, 3, 12], corrupt_index=True)
    ds = zarr_io.open_dataset_zarr(root)
    with pytest.raises(ValueError, match='crc32c'):
      np.asarray(ds['t2m'].values)

  def test_v3_nested_sharding_rejected(self, tmp_path):
    data, arrays = _v3_fixture_arrays()
    root = str(tmp_path / 'v3nest.zarr')
    _write_v3_store(root, {'t2m': arrays['t2m']}, shards=[8, 3, 12])
    meta_path = os.path.join(root, 't2m', 'zarr.json')
    with open(meta_path) as f:
      meta = json.load(f)
    inner = meta['codecs'][0]['configuration']
    inner['codecs'] = [{'name': 'sharding_indexed', 'configuration': {
        'chunk_shape': [2, 3, 6], 'codecs': [{'name': 'bytes'}],
        'index_codecs': [{'name': 'bytes'}], 'index_location': 'end'}}]
    with open(meta_path, 'w') as f:
      json.dump(meta, f)
    with pytest.raises(ValueError, match='nested'):
      zarr_io.open_dataset_zarr(root)


# ---------------------------------------------------------------------------
# zarr v3 sharded (sharding_indexed) WRITE support
# ---------------------------------------------------------------------------


class TestZarrV3ShardedWrite:
  """Writer side of the sharding_indexed codec (VERDICT r4 item 7): shard
  objects pack inner chunks + an end-located uint64 (offset, nbytes) index
  with crc32c — the layout zarr-python 3 defaults to for many-small-chunk
  stores (consumer surface of reference ``beam_pipeline.py:678-681``)."""

  @pytest.mark.parametrize('compressor', [None, 'blosc', 'zstd', 'gzip'])
  def test_roundtrip(self, tmp_path, compressor):
    ds = _dataset()
    path = str(tmp_path / 'sharded.zarr')
    # time: 2 ragged-edged shards of 2 chunks; lat/lon: shard == whole dim.
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 3},
                              compressor=compressor, zarr_format=3,
                              shards={'valid_time': 6})
    back = zarr_io.open_dataset_zarr(path)
    assert set(back) == set(ds)
    for k, da in ds.items():
      got = back[k]
      assert got.dims == da.dims
      np.testing.assert_array_equal(np.asarray(got.data), da.values)
      for cname, c in da.coords.items():
        np.testing.assert_array_equal(
            np.asarray(got.coords[cname].values), np.asarray(c.values))
    # Windowed read crossing the shard boundary.
    win = np.asarray(back['t2m'].isel({'valid_time': slice(4, 9)}).values)
    np.testing.assert_array_equal(win, ds['t2m'].values[4:9])

  def test_layout_and_index(self, tmp_path):
    """On-disk bytes follow the spec: shard-grid chunk keys, payload +
    little-endian index + crc32c at the end, missing sentinel for
    out-of-bounds cells of the ragged edge shard."""
    from weatherbenchx_tpu import codecs as wbx_codecs

    ds = _dataset()  # time=10 → chunks of 3 → 4 cells; shards of 6 → 2
    path = str(tmp_path / 'sharded.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 3},
                              zarr_format=3, shards={'valid_time': 6})
    meta = json.loads(open(os.path.join(path, 't2m', 'zarr.json')).read())
    assert meta['chunk_grid'] == {
        'name': 'regular', 'configuration': {'chunk_shape': [6, 7, 8]}}
    (codec,) = meta['codecs']
    assert codec['name'] == 'sharding_indexed'
    cfg = codec['configuration']
    assert cfg['chunk_shape'] == [3, 7, 8]
    assert cfg['index_location'] == 'end'
    assert [c['name'] for c in cfg['index_codecs']] == ['bytes', 'crc32c']
    assert [c['name'] for c in cfg['codecs']] == ['bytes']
    # Shard-grid keys on disk (2 shards along time), no inner-cell files.
    assert os.path.exists(os.path.join(path, 't2m', 'c', '0', '0', '0'))
    assert os.path.exists(os.path.join(path, 't2m', 'c', '1', '0', '0'))
    assert not os.path.exists(os.path.join(path, 't2m', 'c', '2', '0', '0'))
    # Edge shard: cells 0-1 cover times 6..10 (cell 1 ragged, padded);
    # index entries are (offset, nbytes) uint64-le + crc32c over the index.
    raw = open(os.path.join(path, 't2m', 'c', '1', '0', '0'), 'rb').read()
    index_nbytes = 16 * 2 + 4
    body, crc = raw[-index_nbytes:-4], raw[-4:]
    assert int.from_bytes(crc, 'little') == wbx_codecs.crc32c(body)
    index = np.frombuffer(body, '<u8').reshape(-1, 2)
    cell_nbytes = 3 * 7 * 8 * 4  # raw (uncompressed) inner cells
    np.testing.assert_array_equal(index,
                                  [[0, cell_nbytes],
                                   [cell_nbytes, cell_nbytes]])
    assert len(raw) == 2 * cell_nbytes + index_nbytes

  def test_shard_rounds_up_to_chunk_multiple(self, tmp_path):
    ds = {'v': DimArray(np.arange(20, dtype=np.float32), ('x',))}
    path = str(tmp_path / 'round.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'x': 4}, zarr_format=3,
                              shards={'x': 5})  # → 8 (2 chunks/shard)
    meta = json.loads(open(os.path.join(path, 'v', 'zarr.json')).read())
    assert meta['chunk_grid']['configuration']['chunk_shape'] == [8]
    back = zarr_io.open_dataset_zarr(path)
    np.testing.assert_array_equal(np.asarray(back['v'].data),
                                  ds['v'].values)

  def test_shard_equal_to_chunk_degenerates_to_plain_store(self, tmp_path):
    ds = {'v': DimArray(np.arange(8, dtype=np.float32), ('x',))}
    path = str(tmp_path / 'degen.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'x': 4}, zarr_format=3,
                              shards={'x': 4})
    meta = json.loads(open(os.path.join(path, 'v', 'zarr.json')).read())
    assert [c['name'] for c in meta['codecs']] == ['bytes']

  def test_shards_require_v3(self, tmp_path):
    ds = {'v': DimArray(np.arange(8, dtype=np.float32), ('x',))}
    with pytest.raises(ValueError, match='zarr_format=3'):
      zarr_io.save_dataset_zarr(str(tmp_path / 's'), ds,
                                chunks={'x': 4}, shards={'x': 8})
    with pytest.raises(ValueError, match='zarr_format=3'):
      zarr_io.ZarrArrayWriter(str(tmp_path), 'v', (8,), (4,), np.float32,
                              ('x',), zarr_format=2, shards=(8,))

  def test_partial_write_close_fills_missing_cells(self, tmp_path):
    """Streaming writers (skip-failed / ragged coverage) flush partial
    shards at close(): absent cells carry the missing sentinel and read
    back as fill."""
    with open(os.path.join(str(tmp_path), 'zarr.json'), 'w') as f:
      json.dump({'zarr_format': 3, 'node_type': 'group',
                 'attributes': {}}, f)
    w = zarr_io.ZarrArrayWriter(str(tmp_path), 'v', (12, 4), (3, 4),
                                np.float32, ('t', 'x'), zarr_format=3,
                                shards=(6, 4))
    vals = np.arange(48, dtype=np.float32).reshape(12, 4)
    w.write_block((0, 0), vals[0:3])   # shard 0 incomplete (cell (1,0) absent)
    w.write_block((2, 0), vals[6:9])   # shard 1 complete after next write
    w.write_block((3, 0), vals[9:12])
    # Complete shard was written eagerly, before close.
    assert os.path.exists(os.path.join(str(tmp_path), 'v', 'c', '1', '0'))
    assert not os.path.exists(os.path.join(str(tmp_path), 'v', 'c', '0', '0'))
    w.close()
    back = zarr_io.open_dataset_zarr(str(tmp_path))
    got = np.asarray(back['v'].data)
    np.testing.assert_array_equal(got[0:3], vals[0:3])
    assert np.isnan(got[3:6]).all()
    np.testing.assert_array_equal(got[6:12], vals[6:12])

  def test_tensorstore_reads_our_sharded_store(self, tmp_path):
    """Independent-implementation check: Google tensorstore's zarr3
    driver (not derived from this codebase) decodes our sharded bytes."""
    ts = pytest.importorskip('tensorstore')
    ds = _dataset()
    path = str(tmp_path / 'sharded.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 3},
                              compressor='zstd', zarr_format=3,
                              shards={'valid_time': 6})
    arr = ts.open({'driver': 'zarr3', 'kvstore': {
        'driver': 'file', 'path': os.path.join(path, 't2m')}}).result()
    np.testing.assert_array_equal(arr.read().result(), ds['t2m'].values)

  def test_our_reader_reads_tensorstore_sharded_store(self, tmp_path):
    ts = pytest.importorskip('tensorstore')
    rng = np.random.default_rng(3)
    vals = rng.standard_normal((10, 7)).astype(np.float32)
    path = str(tmp_path / 'ts.zarr' / 'v')
    arr = ts.open({
        'driver': 'zarr3',
        'kvstore': {'driver': 'file', 'path': path},
        'metadata': {
            'shape': [10, 7],
            'chunk_grid': {'name': 'regular',
                           'configuration': {'chunk_shape': [6, 4]}},
            'codecs': [{'name': 'sharding_indexed', 'configuration': {
                'chunk_shape': [3, 2],
                'codecs': [{'name': 'bytes',
                            'configuration': {'endian': 'little'}},
                           {'name': 'zstd',
                            'configuration': {'level': 3}}],
                'index_codecs': [
                    {'name': 'bytes',
                     'configuration': {'endian': 'little'}},
                    {'name': 'crc32c'}],
                'index_location': 'end'}}],
            'data_type': 'float32',
            'fill_value': 'NaN',
            'dimension_names': ['t', 'x'],
        },
        'create': True,
    }).result()
    arr.write(vals).result()
    # group-level zarr.json so open_dataset_zarr recognizes a v3 store
    with open(os.path.join(str(tmp_path / 'ts.zarr'), 'zarr.json'),
              'w') as f:
      json.dump({'zarr_format': 3, 'node_type': 'group',
                 'attributes': {}}, f)
    back = zarr_io.open_dataset_zarr(str(tmp_path / 'ts.zarr'))
    np.testing.assert_array_equal(np.asarray(back['v'].data), vals)
