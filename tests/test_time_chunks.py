import numpy as np
import pytest

from weatherbenchx_tpu.time_chunks import TimeChunks


def _init_times():
  return np.arange(
      '2020-01-01T00', '2020-01-02T00', np.timedelta64(6, 'h'),
      dtype='datetime64[h]')


class TestTimeChunks:
  def test_exact_lead_times_product(self):
    lead_times = np.arange(0, 18, 6, dtype='timedelta64[h]')
    times = TimeChunks(_init_times(), lead_times,
                       init_time_chunk_size=2, lead_time_chunk_size=2)
    chunks = list(times)
    assert len(chunks) == 4
    assert len(times) == 4
    init0, lead0 = chunks[0]
    assert len(init0) == 2 and len(lead0) == 2
    assert init0.dtype == np.dtype('datetime64[ns]')
    assert lead0.dtype == np.dtype('timedelta64[ns]')
    # Last lead chunk is the remainder.
    assert len(chunks[1][1]) == 1

  def test_single_chunk_default(self):
    lead_times = np.arange(0, 18, 6, dtype='timedelta64[h]')
    times = TimeChunks(_init_times(), lead_times)
    assert len(times) == 1
    init, lead = times[0]
    assert len(init) == 4 and len(lead) == 3

  def test_slice_lead_times(self):
    lead = slice(np.timedelta64(0, 'h'), np.timedelta64(6, 'h'))
    times = TimeChunks(_init_times(), lead, init_time_chunk_size=2)
    chunks = list(times)
    assert len(chunks) == 2
    assert isinstance(chunks[0][1], slice)

  def test_slice_with_lead_chunking_raises(self):
    lead = slice(np.timedelta64(0, 'h'), np.timedelta64(6, 'h'))
    with pytest.raises(ValueError):
      TimeChunks(_init_times(), lead, lead_time_chunk_size=2)

  def test_slice_requires_bounds(self):
    with pytest.raises(ValueError):
      TimeChunks(_init_times(), slice(None, np.timedelta64(6, 'h')))
    with pytest.raises(ValueError):
      TimeChunks(_init_times(), slice(
          np.timedelta64(0, 'h'), np.timedelta64(6, 'h'), np.timedelta64(1, 'h')))

  def test_negative_chunk_size_raises(self):
    lead_times = np.arange(0, 18, 6, dtype='timedelta64[h]')
    with pytest.raises(ValueError):
      TimeChunks(_init_times(), lead_times, init_time_chunk_size=-1)

  def test_getitem(self):
    lead_times = np.arange(0, 18, 6, dtype='timedelta64[h]')
    times = TimeChunks(_init_times(), lead_times,
                       init_time_chunk_size=2, lead_time_chunk_size=2)
    for i, chunk in enumerate(times):
      init, lead = times[i]
      np.testing.assert_array_equal(init, chunk[0])
      np.testing.assert_array_equal(lead, chunk[1])
    with pytest.raises(IndexError):
      times[4]

  def test_iter_with_chunk_offsets(self):
    lead_times = np.arange(0, 18, 6, dtype='timedelta64[h]')
    times = TimeChunks(_init_times(), lead_times,
                       init_time_chunk_size=2, lead_time_chunk_size=2)
    offsets = [o for o, _ in times.iter_with_chunk_offsets()]
    assert [(o.init_time, o.lead_time) for o in offsets] == [
        (0, 0), (0, 2), (2, 0), (2, 2)]


def test_zero_chunk_size_rejected():
  init = np.array(['2020-01-01'], dtype='datetime64[ns]')
  lead = np.array([0], dtype='timedelta64[h]').astype('timedelta64[ns]')
  with pytest.raises(ValueError, match='positive int or None'):
    TimeChunks(init, lead, init_time_chunk_size=0)
  with pytest.raises(ValueError, match='positive int or None'):
    TimeChunks(init, slice(None), lead_time_chunk_size=0)
