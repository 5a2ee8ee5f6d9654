"""Codec layer tests: blosc framing, zstd/zlib cells, zarr integration.

The blosc implementation mirrors the c-blosc1 chunk format
(README_CHUNK_FORMAT.rst) used by numcodecs.Blosc — the compressor of
real-world WeatherBench/ERA5 zarr stores (reference
``xarray_loaders.py:55-141`` reads such stores through zarr/numcodecs).
"""

import shutil
import struct

import numpy as np
import pytest

from weatherbenchx_tpu import codecs
from weatherbenchx_tpu import zarr_io
from weatherbenchx_tpu.darray import Coord, DimArray


@pytest.mark.parametrize('dtype', [np.float32, np.float64, np.int16,
                                   np.uint8, np.int64])
@pytest.mark.parametrize('n', [0, 1, 7, 100, 5000, 70000])
def test_blosc_roundtrip_dtypes_sizes(dtype, n):
  rng = np.random.default_rng(n)
  arr = (rng.standard_normal(n) * 100).astype(dtype)
  raw = arr.tobytes()
  chunk = codecs.blosc_compress(raw, np.dtype(dtype).itemsize)
  out = codecs.blosc_decompress(chunk)
  assert bytes(out) == raw


@pytest.mark.parametrize('cname', ['lz4', 'zstd', 'zlib'])
@pytest.mark.parametrize('shuffle', [True, False])
def test_blosc_roundtrip_compressors(cname, shuffle):
  arr = np.arange(100000, dtype=np.float32)  # compressible
  raw = arr.tobytes()
  chunk = codecs.blosc_compress(raw, 4, cname=cname, shuffle=shuffle)
  if shuffle:
    assert len(chunk) < len(raw)  # byte-shuffled arange compresses well
  assert bytes(codecs.blosc_decompress(chunk)) == raw


def test_blosc_multiblock():
  # > one 256 KB block, both split (lz4) and non-split (zstd) framing.
  raw = np.arange(300000, dtype=np.float64).tobytes()  # 2.4 MB, 10 blocks
  for cname in ('lz4', 'zstd'):
    chunk = codecs.blosc_compress(raw, 8, cname=cname)
    assert bytes(codecs.blosc_decompress(chunk)) == raw


def test_blosc_header_fields():
  raw = np.arange(100000, dtype=np.float32).tobytes()
  chunk = codecs.blosc_compress(raw, 4, cname='lz4')
  version, _, flags, typesize = chunk[0], chunk[1], chunk[2], chunk[3]
  nbytes, blocksize, cbytes = struct.unpack_from('<iii', chunk, 4)
  assert version == 2
  assert typesize == 4
  assert nbytes == len(raw)
  assert cbytes == len(chunk)
  assert flags & 0x1  # shuffled
  assert (flags >> 5) & 0x7 == 1  # lz4
  assert blocksize % typesize == 0
  # lz4 + typesize 4 + big blocks => split blocks, flag 0x10 clear
  assert not flags & 0x10
  # zstd chunks must mark non-split
  zchunk = codecs.blosc_compress(raw, 4, cname='zstd')
  assert zchunk[2] & 0x10


def test_blosc_memcpy_chunk_spec_exact():
  """A hand-built pure-memcpy chunk per the format spec must decode."""
  payload = bytes(range(256)) * 4
  header = struct.pack('<BBBBiii', 2, 0, 0x2, 1, len(payload), len(payload),
                       len(payload) + 16)
  assert bytes(codecs.blosc_decompress(header + payload)) == payload


def test_blosc_stored_streams():
  """Incompressible data: streams stored with csize == neblock."""
  rng = np.random.default_rng(0)
  raw = rng.integers(0, 256, 400000, dtype=np.uint8).tobytes()
  chunk = codecs.blosc_compress(raw, 1)
  assert bytes(codecs.blosc_decompress(chunk)) == raw


def test_blosc_shuffle_is_byte_transpose():
  # shuffle of [a0 a1 a2 a3 | b0 b1 b2 b3] = [a0 b0 | a1 b1 | a2 b2 | a3 b3]
  block = bytes([0xA0, 0xA1, 0xA2, 0xA3, 0xB0, 0xB1, 0xB2, 0xB3])
  shuf = codecs._shuffle(block, 4)
  assert shuf == bytes([0xA0, 0xB0, 0xA1, 0xB1, 0xA2, 0xB2, 0xA3, 0xB3])
  assert codecs._unshuffle(shuf, 4) == block
  # leftover bytes (len not divisible by typesize) pass through verbatim
  blk = block + b'\xff\xfe'
  assert codecs._unshuffle(codecs._shuffle(blk, 4), 4) == blk


def test_blosc_bitshuffle_rejected():
  hdr = struct.pack('<BBBBiii', 2, 0, 0x4, 4, 16, 16, 32) + b'\0' * 16
  with pytest.raises(ValueError, match='bit-shuffle'):
    codecs.blosc_decompress(hdr)


@pytest.mark.parametrize('codec', [None, 'zlib', 'zstd', 'blosc'])
def test_cell_roundtrip(codec):
  arr = np.linspace(0, 1, 30000).astype(np.float32)
  raw = arr.tobytes()
  enc = codecs.encode_cell(raw, codec, 4)
  out = codecs.decode_cell(enc, codec, len(raw))
  assert np.array_equal(np.frombuffer(out, np.float32), arr)


def test_decode_cell_gzip():
  import gzip
  raw = b'x' * 1000
  assert bytes(memoryview(
      codecs.decode_cell(gzip.compress(raw), 'gzip', 1000))) == raw


def test_decode_cell_wrong_size_raises():
  import zlib as _z
  with pytest.raises(ValueError, match='expected'):
    codecs.decode_cell(_z.compress(b'abc'), 'zlib', 5)


def test_codec_from_config():
  assert codecs.codec_from_config(None) is None
  assert codecs.codec_from_config({'id': 'zlib', 'level': 1}) == 'zlib'
  assert codecs.codec_from_config(
      {'id': 'blosc', 'cname': 'lz4', 'clevel': 5, 'shuffle': 1}) == 'blosc'
  with pytest.raises(ValueError, match='not supported'):
    codecs.codec_from_config({'id': 'bz2'})


@pytest.mark.parametrize('comp', ['zstd', 'blosc'])
def test_zarr_store_roundtrip_compressed(tmp_path, comp):
  rng = np.random.default_rng(1)
  data = rng.standard_normal((6, 7, 9)).astype(np.float32)
  da = DimArray(data, ('time', 'lat', 'lon'), {
      'time': Coord(('time',), np.arange(6)),
      'lat': Coord(('lat',), np.linspace(-90, 90, 7)),
      'lon': Coord(('lon',), np.linspace(0, 360, 9, endpoint=False))})
  root = str(tmp_path / f'{comp}.zarr')
  zarr_io.save_dataset_zarr(root, {'x': da}, chunks={'time': 2, 'lat': 3},
                            compressor=comp)
  ds = zarr_io.open_dataset_zarr(root)
  # windowed read crossing cell boundaries on two axes
  win = ds['x'].isel({'time': slice(1, 5), 'lat': np.array([0, 2, 5])})
  expect = data[1:5][:, [0, 2, 5]]
  assert np.array_equal(np.asarray(win.values), expect)
  # full read
  assert np.array_equal(np.asarray(ds['x'].values), data)


def test_zarr_filters_rejected(tmp_path):
  root = tmp_path / 'f.zarr'
  (root / 'x').mkdir(parents=True)
  import json
  (root / 'x' / '.zarray').write_text(json.dumps({
      'zarr_format': 2, 'shape': [4], 'chunks': [4], 'dtype': '<f4',
      'compressor': None, 'fill_value': 'NaN', 'order': 'C',
      'filters': [{'id': 'delta'}]}))
  (root / 'x' / '.zattrs').write_text(json.dumps(
      {'_ARRAY_DIMENSIONS': ['t']}))
  with pytest.raises(ValueError, match='filters'):
    zarr_io.open_dataset_zarr(str(root))


def test_zarr_reversed_and_strided_window(tmp_path):
  data = np.arange(5 * 8, dtype=np.float32).reshape(5, 8)
  da = DimArray(data, ('a', 'b'), {
      'a': Coord(('a',), np.arange(5)), 'b': Coord(('b',), np.arange(8))})
  root = str(tmp_path / 's.zarr')
  zarr_io.save_dataset_zarr(root, {'x': da}, chunks={'a': 2, 'b': 3})
  ds = zarr_io.open_dataset_zarr(root)
  idx = np.array([4, 1, 3])
  got = np.asarray(ds['x'].isel({'a': idx, 'b': slice(1, 8, 2)}).values)
  assert np.array_equal(got, data[idx][:, 1:8:2])


class TestNativeDecoder:
  """Native (C++) threaded decoder vs the pure-Python codec path."""

  @pytest.fixture()
  def store(self, tmp_path):
    rng = np.random.default_rng(7)
    data = rng.standard_normal((10, 13, 17)).astype(np.float32)
    da = DimArray(data, ('t', 'y', 'x'), {
        't': Coord(('t',), np.arange(10)),
        'y': Coord(('y',), np.arange(13)),
        'x': Coord(('x',), np.arange(17))})
    return data, da, tmp_path

  @pytest.mark.parametrize('comp', ['zlib', 'zstd', 'blosc'])
  def test_native_matches_python(self, store, comp, monkeypatch):
    from weatherbenchx_tpu import native
    if not native.zarrcodec_available():
      pytest.skip('native toolchain unavailable')
    data, da, tmp_path = store
    root = str(tmp_path / f'{comp}_native.zarr')
    zarr_io.save_dataset_zarr(root, {'v': da}, chunks={'t': 3, 'y': 5},
                              compressor=comp)
    ds = zarr_io.open_dataset_zarr(root)
    win = {'t': slice(1, 8), 'y': np.array([0, 4, 12])}
    got_native = np.asarray(ds['v'].isel(win).values)
    monkeypatch.setattr(native, 'zarrcodec_available', lambda: False)
    ds2 = zarr_io.open_dataset_zarr(root)
    got_python = np.asarray(ds2['v'].isel(win).values)
    np.testing.assert_array_equal(got_native, got_python)
    np.testing.assert_array_equal(got_native, data[1:8][:, [0, 4, 12]])

  def test_missing_cell_fill(self, store):
    import os
    data, da, tmp_path = store
    root = str(tmp_path / 'holes.zarr')
    zarr_io.save_dataset_zarr(root, {'v': da}, chunks={'t': 3},
                              compressor='zstd')
    os.remove(os.path.join(root, 'v', '1.0.0'))  # t=3..5 now missing
    ds = zarr_io.open_dataset_zarr(root)
    got = np.asarray(ds['v'].values)
    assert np.isnan(got[3:6]).all()
    np.testing.assert_array_equal(got[:3], data[:3])
    np.testing.assert_array_equal(got[6:], data[6:])

  def test_corrupt_cell_raises(self, store):
    import os
    data, da, tmp_path = store
    root = str(tmp_path / 'bad.zarr')
    zarr_io.save_dataset_zarr(root, {'v': da}, chunks={'t': 3},
                              compressor='blosc')
    with open(os.path.join(root, 'v', '0.0.0'), 'wb') as f:
      f.write(b'\x00' * 7)
    ds = zarr_io.open_dataset_zarr(root)
    with pytest.raises((OSError, ValueError)):
      np.asarray(ds['v'].values)


class TestRemoteZarr:
  """fsspec-backed stores (memory:// standing in for gs://)."""

  def _dataset(self):
    rng = np.random.default_rng(3)
    data = rng.standard_normal((6, 5, 7)).astype(np.float32)
    da = DimArray(data, ('time', 'lat', 'lon'), {
        'time': Coord(('time',),
                      np.datetime64('2020-01-01', 'ns')
                      + np.arange(6) * np.timedelta64(6, 'h')),
        'lat': Coord(('lat',), np.linspace(-90, 90, 5)),
        'lon': Coord(('lon',), np.linspace(0, 360, 7, endpoint=False))})
    return data, da

  def test_remote_store_lazy_window(self):
    data, da = self._dataset()
    url = 'memory://zstores/a.zarr'
    zarr_io.save_dataset_zarr(url, {'v': da}, chunks={'time': 2},
                              compressor='blosc')
    ds = zarr_io.open_dataset_zarr(url)
    got = np.asarray(ds['v'].isel({'time': slice(1, 5)}).values)
    np.testing.assert_array_equal(got, data[1:5])
    assert ds['v'].coords['time'].values.dtype == np.dtype('datetime64[ns]')

  def test_remote_load_dataset_any(self):
    from weatherbenchx_tpu import fileio
    data, da = self._dataset()
    url = 'memory://zstores/b.zarr'
    fileio.save_dataset_atomic(url, {'v': da})
    out = fileio.load_dataset_any(url)
    np.testing.assert_array_equal(np.asarray(out['v'].values), data)

  def test_remote_loader_end_to_end(self):
    """DatasetBackedLoader streaming chunks from a remote store."""
    from weatherbenchx_tpu.data import loaders
    data, da = self._dataset()
    url = 'memory://zstores/c.zarr'
    zarr_io.save_dataset_zarr(
        url, {'2m_temperature': da.rename(
            {'time': 'valid_time', 'lat': 'latitude',
             'lon': 'longitude'})},
        chunks={'time': 2}, compressor='zstd')
    loader = loaders.TargetsFromDataset(path=url, rename_dimensions=None)
    init = np.datetime64('2020-01-01', 'ns') + np.arange(2) * np.timedelta64(
        6, 'h')
    lead = (np.arange(2) * np.timedelta64(6, 'h')).astype('timedelta64[ns]')
    chunk = loader.load_chunk(init, lead)
    got = np.asarray(chunk['2m_temperature'].values)
    assert got.shape == (2, 2, 5, 7)
    np.testing.assert_array_equal(got[0, 0], data[0])
    np.testing.assert_array_equal(got[1, 1], data[2])


def test_cf_float_time_decode(tmp_path):
  """Float-encoded CF time (xarray writes e.g. float64 'days since ...')
  must round, not truncate: 0.25 days is 06:00, not 00:00."""
  import json
  root = tmp_path / 'ft.zarr'
  (root / 'time').mkdir(parents=True)
  vals = np.array([0.0, 0.25, 0.5, 1.75])
  (root / 'time' / '.zarray').write_text(json.dumps({
      'zarr_format': 2, 'shape': [4], 'chunks': [4], 'dtype': '<f8',
      'compressor': None, 'fill_value': 'NaN', 'order': 'C',
      'filters': None}))
  (root / 'time' / '.zattrs').write_text(json.dumps({
      '_ARRAY_DIMENSIONS': ['time'],
      'units': 'days since 2020-01-01', 'calendar': 'proleptic_gregorian'}))
  (root / 'time' / '0').write_bytes(vals.tobytes())
  (root / 'v').mkdir()
  (root / 'v' / '.zarray').write_text(json.dumps({
      'zarr_format': 2, 'shape': [4], 'chunks': [4], 'dtype': '<f4',
      'compressor': None, 'fill_value': 'NaN', 'order': 'C',
      'filters': None}))
  (root / 'v' / '.zattrs').write_text(json.dumps(
      {'_ARRAY_DIMENSIONS': ['time']}))
  (root / 'v' / '0').write_bytes(np.arange(4, dtype=np.float32).tobytes())
  ds = zarr_io.open_dataset_zarr(str(root))
  t = ds['v'].coords['time'].values
  expect = (np.datetime64('2020-01-01', 'ns')
            + (vals * 86400e9).astype(np.int64) * np.timedelta64(1, 'ns'))
  np.testing.assert_array_equal(t, expect)


def test_cf_float_timedelta_decode():
  from weatherbenchx_tpu.zarr_io import _decode_cf_time
  out = _decode_cf_time(np.array([0.5, 1.0]), {'units': 'hours'})
  np.testing.assert_array_equal(
      out, np.array([1800, 3600], 'timedelta64[s]').astype('timedelta64[ns]'))


class TestNativeEncoder:
  """Native (C++) parallel encode+write vs the Python codec path."""

  @pytest.mark.parametrize('comp', [None, 'zlib', 'zstd', 'blosc'])
  def test_native_write_python_read(self, tmp_path, comp, monkeypatch):
    from weatherbenchx_tpu import native
    if not native.zarrcodec_available():
      pytest.skip('native toolchain unavailable')
    rng = np.random.default_rng(5)
    data = rng.standard_normal((9, 11, 6)).astype(np.float32)
    da = DimArray(data, ('t', 'y', 'x'), {
        't': Coord(('t',), np.arange(9)),
        'y': Coord(('y',), np.arange(11)),
        'x': Coord(('x',), np.arange(6))})
    root = str(tmp_path / 'nw.zarr')
    zarr_io.save_dataset_zarr(root, {'v': da}, chunks={'t': 2, 'y': 4},
                              compressor=comp)  # native multi-cell encode
    # Read back through the pure-Python decoder only.
    monkeypatch.setattr(native, 'zarrcodec_available', lambda: False)
    ds = zarr_io.open_dataset_zarr(root)
    np.testing.assert_array_equal(np.asarray(ds['v'].values), data)

  def test_python_fallback_write_matches(self, tmp_path, monkeypatch):
    from weatherbenchx_tpu import native
    rng = np.random.default_rng(6)
    data = rng.standard_normal((8, 5)).astype(np.float64)
    da = DimArray(data, ('t', 'y'), {
        't': Coord(('t',), np.arange(8)), 'y': Coord(('y',), np.arange(5))})
    monkeypatch.setattr(native, 'zarrcodec_available', lambda: False)
    root = str(tmp_path / 'pw.zarr')
    zarr_io.save_dataset_zarr(root, {'v': da}, chunks={'t': 3},
                              compressor='blosc')  # threaded Python encode
    ds = zarr_io.open_dataset_zarr(root)
    np.testing.assert_array_equal(np.asarray(ds['v'].values), data)

  def test_native_blosc_chunk_decodes_in_python(self):
    from weatherbenchx_tpu import native
    if not native.zarrcodec_available():
      pytest.skip('native toolchain unavailable')
    import tempfile, os
    arr = np.arange(123457, dtype=np.float32)  # odd size: ragged last block
    with tempfile.TemporaryDirectory() as d:
      p = os.path.join(d, 'cell')
      native.encode_cells([p], 'blosc', [arr], typesize=4)
      raw = open(p, 'rb').read()
    assert bytes(codecs.blosc_decompress(raw)) == arr.tobytes()


class TestNativeDecoderRobustness:
  def _blosc_store(self, tmp_path):
    # Compressible data: an incompressible chunk would be written as a
    # memcpy chunk with no block starts to corrupt.
    data = np.tile(np.arange(8, dtype=np.float32), (6, 1)) * 0 + 1.5
    da = DimArray(data, ('t', 'x'), {'t': Coord(('t',), np.arange(6)),
                                     'x': Coord(('x',), np.arange(8))})
    root = str(tmp_path / 'negb.zarr')
    zarr_io.save_dataset_zarr(root, {'v': da}, chunks={'t': 6},
                              compressor='blosc')
    return root, data

  def test_negative_bstart_clean_error_not_oob(self, tmp_path):
    """A corrupt negative block-start must yield a clean malformed-chunk
    error in the NATIVE decoder — sign-extension into size_t would wrap
    the bounds check and read out of bounds (crash/garbage)."""
    import os
    from weatherbenchx_tpu import native
    if not native.zarrcodec_available():
      pytest.skip('native toolchain unavailable')
    root, _ = self._blosc_store(tmp_path)
    cell = os.path.join(root, 'v', '0.0')
    raw = bytearray(open(cell, 'rb').read())
    assert not raw[2] & 0x2, 'need a compressed (non-memcpy) chunk'
    raw[16:20] = b'\xfc\xff\xff\xff'  # bstarts[0] = -4
    open(cell, 'wb').write(bytes(raw))
    ds = zarr_io.open_dataset_zarr(root)
    with pytest.raises((OSError, ValueError)):
      np.asarray(ds['v'].values)


class TestNativeEncodeLevelFidelity:
  """Explicit compression levels (incl. 0) pass through the native encode
  path instead of being remapped to the codec default."""

  def _write(self, tmp_path, name, level, monkeypatch=None, native_off=False):
    from weatherbenchx_tpu import native
    if native_off:
      monkeypatch.setattr(native, 'zarrcodec_available', lambda: False)
    rng = np.random.default_rng(3)
    # Compressible data so level 0 (stored) differs in size from level 9.
    data = np.repeat(rng.standard_normal(64), 64).astype(np.float64)
    w = zarr_io.ZarrArrayWriter(
        str(tmp_path), name, data.shape, (32,), data.dtype, ('x',),
        compressor='zlib', compression_level=level)
    w.write_full(data)
    import os
    sizes = sorted(os.path.getsize(os.path.join(str(tmp_path), name, k))
                   for k in os.listdir(os.path.join(str(tmp_path), name))
                   if not k.startswith('.'))
    return data, sizes

  def test_level0_matches_python_and_differs_from_default(
      self, tmp_path, monkeypatch):
    from weatherbenchx_tpu import native
    if not native.zarrcodec_available():
      pytest.skip('native toolchain unavailable')
    data, sizes_native0 = self._write(tmp_path, 'n0', 0)
    _, sizes_py0 = self._write(tmp_path, 'p0', 0, monkeypatch,
                               native_off=True)
    assert sizes_native0 == sizes_py0  # level honored on both paths
    _, sizes_native9 = self._write(tmp_path, 'n9', 9)
    assert sum(sizes_native0) > sum(sizes_native9)  # 0 really means stored
    for name in ('n0', 'p0', 'n9'):
      src = zarr_io.ZarrChunkSource(
          str(tmp_path / name),
          __import__('json').load(open(tmp_path / name / '.zarray')))
      np.testing.assert_array_equal(src.read((slice(None),)), data)
