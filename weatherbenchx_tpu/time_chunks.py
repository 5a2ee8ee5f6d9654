"""Evaluation-time chunking: the Cartesian grid of (init_time, lead_time) chunks.

Semantics match the reference (``weatherbenchX/time_chunks.py:36-202``):
the iterator yields the product of init_time chunks × lead_time chunks;
lead times are either an exact np.timedelta64 array (chunkable) or a slice
interval (single chunk, inclusive end). Chunk offsets locate each chunk in
the full arrays for result assembly.

On TPU this is pure host-side driver code: chunks map 1:1 onto jitted
evaluation steps, and (via ``parallel.pipeline``) onto shards of the device
mesh, replacing the reference's ``beam.Create`` fan-out
(``beam_pipeline.py:436-451``).
"""

from collections.abc import Iterable, Iterator
import dataclasses
import itertools
from typing import Optional, Union

import numpy as np

TimeChunk = tuple[np.ndarray, Union[np.ndarray, slice]]


@dataclasses.dataclass(frozen=True)
class TimeChunkOffsets:
  init_time: int
  lead_time: int


class TimeChunks(Iterable[TimeChunk]):
  """Iterable over (init_times, lead_times) chunk tuples."""

  def __init__(
      self,
      init_times: np.ndarray,
      lead_times: Union[np.ndarray, slice],
      init_time_chunk_size: Optional[int] = None,
      lead_time_chunk_size: Optional[int] = None,
  ):
    if init_time_chunk_size is not None and init_time_chunk_size < 0:
      raise ValueError(
          f'{init_time_chunk_size=} but should be non-negative or None')
    if lead_time_chunk_size is not None and lead_time_chunk_size < 0:
      raise ValueError(
          f'{lead_time_chunk_size=} but should be non-negative or None')

    init_times = np.asarray(init_times).astype('datetime64[ns]')
    if not init_time_chunk_size:
      init_time_chunk_size = max(len(init_times), 1)
    self._init_time_chunks = [
        init_times[i:i + init_time_chunk_size]
        for i in range(0, len(init_times), init_time_chunk_size)
    ]

    if isinstance(lead_times, slice):
      if lead_times.start is None or lead_times.stop is None:
        raise ValueError('Slice start and stop must be specified.')
      if lead_times.step is not None:
        raise ValueError('Slice step must be None.')
      if lead_time_chunk_size:
        raise ValueError('Chunking in lead time not compatible with slice.')
      self._lead_time_chunks: list = [lead_times]
    elif isinstance(lead_times, np.ndarray):
      lead_times = lead_times.astype('timedelta64[ns]')
      if not lead_time_chunk_size:
        lead_time_chunk_size = max(len(lead_times), 1)
      self._lead_time_chunks = [
          lead_times[i:i + lead_time_chunk_size]
          for i in range(0, len(lead_times), lead_time_chunk_size)
      ]
    else:
      raise ValueError('Lead times must be either np.ndarray or slice.')

    self._init_times = init_times
    self._lead_times = lead_times
    self._init_time_chunk_size = init_time_chunk_size
    self._lead_time_chunk_size = lead_time_chunk_size
    self._num_init_chunks = len(self._init_time_chunks)
    self._num_lead_chunks = len(self._lead_time_chunks)

  @property
  def init_times(self) -> np.ndarray:
    return self._init_times

  @property
  def lead_times(self) -> Union[np.ndarray, slice]:
    return self._lead_times

  @property
  def init_time_chunk_size(self) -> int:
    return self._init_time_chunk_size

  @property
  def lead_time_chunk_size(self) -> Optional[int]:
    return self._lead_time_chunk_size

  def __iter__(self) -> Iterator[TimeChunk]:
    return itertools.product(self._init_time_chunks, self._lead_time_chunks)

  def __len__(self) -> int:
    return self._num_init_chunks * self._num_lead_chunks

  def __getitem__(self, index: int) -> TimeChunk:
    if index < 0 or index >= len(self):
      raise IndexError(f'TimeChunks index out of range: {index}')
    init_chunk = self._init_time_chunks[index // self._num_lead_chunks]
    lead_chunk = self._lead_time_chunks[index % self._num_lead_chunks]
    return init_chunk, lead_chunk

  def iter_with_chunk_offsets(
      self,
  ) -> Iterator[tuple[TimeChunkOffsets, TimeChunk]]:
    """Yields (offsets, chunk) pairs locating each chunk in the full arrays."""
    for index, chunk in enumerate(self):
      init_index = self._init_time_chunk_size * (
          index // self._num_lead_chunks)
      lead_index = (self._lead_time_chunk_size or 0) * (
          index % self._num_lead_chunks)
      yield TimeChunkOffsets(init_time=init_index, lead_time=lead_index), chunk
