"""``arch.bootstrap.optimal_block_length`` stand-in for the parity harness.

Mimics the slice of the real API the reference uses
(``statistical_inference/bootstrap.py:426-427``): the result exposes a
``.stationary`` column whose ``.item()`` yields the mean block length.
"""

import numpy as np

from weatherbenchx_tpu.inference import block_length as _block_length


class _Column:

  def __init__(self, value):
    self._value = float(value)

  def item(self) -> float:
    return self._value


class _BlockLengthResult:
  """Duck-types the one-row DataFrame the real ``arch`` returns."""

  def __init__(self, stationary):
    self.stationary = _Column(stationary)
    # The real package also reports a circular-bootstrap column; the
    # reference never reads it but keep the attribute for shape parity.
    self.circular = _Column(stationary)


def optimal_block_length(x) -> _BlockLengthResult:
  return _BlockLengthResult(
      _block_length.optimal_block_length_stationary(np.asarray(x)))
