"""Neighborhood-averaging kernels for spatial metrics (FSS).

The reference does a separable 2-D uniform convolution with scipy
(``metrics/spatial.py:24-56``), one grid at a time through np vectorize.
Here the moving average is an O(N) wrap-padded cumulative-sum difference in
jnp, batched over all leading dims in one XLA program — bandwidth-bound and
fusable with the surrounding statistic math.
"""

import jax.numpy as jnp


def uniform_filter1d_wrap(x: jnp.ndarray, size: int, axis: int,
                          divide: bool = True) -> jnp.ndarray:
  """Uniform moving average of odd window ``size`` with wraparound padding.

  ``divide=False`` returns the window SUM — callers composing separable
  passes should divide once at the end: for binary fields (FSS's inputs)
  the cumsums then stay exact small integers (≪ 2^24) instead of
  accumulating f32 rounding on pre-divided fractions (measured 2.7e-5 →
  exact at 0.25° row lengths).
  """
  if size == 1:
    return x
  half = (size - 1) // 2
  x = jnp.moveaxis(x, axis, -1)
  pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
  xp = jnp.pad(x, pad, mode='wrap')
  # Accumulate in at least float32 but never BELOW the input precision: a
  # float64 FSS field under jax_enable_x64 keeps the reference's (scipy
  # float64 convolution) accuracy instead of losing it to an f32 cumsum.
  acc = jnp.promote_types(x.dtype, jnp.float32)
  csum = jnp.cumsum(xp.astype(acc), axis=-1)
  zero = jnp.zeros(csum.shape[:-1] + (1,), csum.dtype)
  csum = jnp.concatenate([zero, csum], axis=-1)
  out = csum[..., size:] - csum[..., :-size]
  if divide:
    out = out / size
  return jnp.moveaxis(out, -1, axis)


def convolve2d_wrap_longitude(
    x: jnp.ndarray,
    neighborhood_size: int,
    wrap_longitude: bool = False,
) -> jnp.ndarray:
  """Separable 2-D uniform convolution over the two trailing axes.

  Matches reference semantics (``spatial.py:24-56``): wrap padding on both
  axes; the outermost half-window rows (latitude) are zeroed always, and the
  longitude edges are zeroed when wrap_longitude=False. Trailing axes are
  (latitude, longitude).
  """
  if neighborhood_size == 1:
    return x
  if neighborhood_size % 2 != 1:
    raise ValueError('neighborhood_size must be odd.')
  half = (neighborhood_size - 1) // 2
  out = uniform_filter1d_wrap(
      x.astype(jnp.promote_types(x.dtype, jnp.float32)),
      neighborhood_size, axis=-2, divide=False)
  out = uniform_filter1d_wrap(out, neighborhood_size, axis=-1, divide=False)
  out = out / (neighborhood_size * neighborhood_size)
  lat = jnp.arange(out.shape[-2])
  valid_lat = (lat >= half) & (lat < out.shape[-2] - half)
  out = out * valid_lat[:, None]
  if not wrap_longitude:
    lon = jnp.arange(out.shape[-1])
    valid_lon = (lon >= half) & (lon < out.shape[-1] - half)
    out = out * valid_lon[None, :]
  return out
