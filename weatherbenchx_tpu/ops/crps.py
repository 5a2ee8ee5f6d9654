"""Pallas TPU kernel for the sort-based (PWM) CRPS spread.

The fair-CRPS spread needs the ensemble sorted per grid point
(``metrics/probabilistic.py`` PWM form). XLA's generic sort over a 50-member
axis is the throughput bottleneck of the headline CRPS benchmark; this
kernel instead runs a fully-unrolled bitonic sorting network over "member
planes": each ensemble member is an (8, lanes) VPU tile, and every
compare-exchange is one elementwise min/max over the whole tile — the sort
vectorizes across 1024+ grid points at once. Members are padded to a power
of two with +BIG so real values occupy the first M sorted positions; the
PWM coefficients are zero on the padding.

The kernel also emits the CRPS skill term E|X - y| from the same VMEM
residency, halving HBM traffic versus computing skill and spread in
separate passes.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # Larger than any finite float32 data; avoids inf arithmetic.

# Points per block: sublanes × lanes of one member plane.
_SUBLANES = 8
_LANES = 256


def _bitonic_pairs(n: int):
  """Compare-exchange pairs (i, j, direction) of a bitonic network for n=2^k.

  Directions are normalized so the final sequence is ascending.
  """
  pairs = []
  k = 2
  while k <= n:
    j = k // 2
    while j >= 1:
      for i in range(n):
        l = i ^ j
        if l > i:
          ascending = (i & k) == 0
          pairs.append((i, l, ascending))
      j //= 2
    k *= 2
  return pairs


def _crps_kernel(pred_ref, tgt_ref, skill_ref, pwm_ref, *, m: int,
                 n_pad: int):
  """One block: skill sum and PWM spread sum over the ensemble axis."""
  y = tgt_ref[0]  # (_SUBLANES, _LANES)

  planes = [pred_ref[0, i] for i in range(m)]

  # Skill: Σ_i |x_i - y| (mean taken by the caller).
  skill = jnp.abs(planes[0] - y)
  for i in range(1, m):
    skill = skill + jnp.abs(planes[i] - y)
  skill_ref[0] = skill

  # Pad to the sorting-network size with +BIG.
  big = jnp.full_like(y, _BIG)
  planes = planes + [big] * (n_pad - m)

  for i, j, ascending in _bitonic_pairs(n_pad):
    lo = jnp.minimum(planes[i], planes[j])
    hi = jnp.maximum(planes[i], planes[j])
    planes[i], planes[j] = (lo, hi) if ascending else (hi, lo)

  # PWM sum: Σ_{k<m} (2(k+1) - m - 1) · x_(k). Padding (k >= m) excluded.
  pwm = (2 * 1 - m - 1) * planes[0]
  for k in range(1, m):
    pwm = pwm + (2 * (k + 1) - m - 1) * planes[k]
  pwm_ref[0] = pwm


@functools.partial(
    jax.jit, static_argnames=('ensemble_axis', 'interpret'))
def crps_skill_and_pwm(
    pred: jnp.ndarray,
    tgt: jnp.ndarray,
    ensemble_axis: int = 0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Returns (Σ_i |x_i - y|, Σ_k (2k-M-1) x_(k)) per point.

  pred has the ensemble on ``ensemble_axis``; tgt is pred without that axis.
  Callers normalize: skill_mean = skill/M; fair spread =
  2·pwm/(M·(M-1))/M... see ``metrics/probabilistic.py``.
  """
  m = pred.shape[ensemble_axis]
  if m < 2:
    raise ValueError('Need at least 2 ensemble members.')
  n_pad = max(2, 2 ** math.ceil(math.log2(m)))

  pred = jnp.moveaxis(pred, ensemble_axis, 0).astype(jnp.float32)
  point_shape = pred.shape[1:]
  n_points = int(np.prod(point_shape)) if point_shape else 1
  block = _SUBLANES * _LANES
  n_blocks = -(-n_points // block)
  padded = n_blocks * block

  pred2 = pred.reshape(m, n_points)
  tgt2 = tgt.astype(jnp.float32).reshape(n_points)
  if padded != n_points:
    pred2 = jnp.pad(pred2, ((0, 0), (0, padded - n_points)))
    tgt2 = jnp.pad(tgt2, (0, padded - n_points))
  pred_blocks = pred2.reshape(m, n_blocks, _SUBLANES, _LANES).transpose(
      1, 0, 2, 3)  # (B, M, 8, L)
  tgt_blocks = tgt2.reshape(n_blocks, _SUBLANES, _LANES)

  kernel = functools.partial(_crps_kernel, m=m, n_pad=n_pad)
  skill, pwm = pl.pallas_call(
      kernel,
      grid=(n_blocks,),
      in_specs=[
          pl.BlockSpec((1, m, _SUBLANES, _LANES), lambda b: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, _SUBLANES, _LANES), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((1, _SUBLANES, _LANES), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, _SUBLANES, _LANES), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((n_blocks, _SUBLANES, _LANES), jnp.float32),
          jax.ShapeDtypeStruct((n_blocks, _SUBLANES, _LANES), jnp.float32),
      ],
      interpret=interpret,
  )(pred_blocks, tgt_blocks)

  skill = skill.reshape(padded)[:n_points].reshape(point_shape)
  pwm = pwm.reshape(padded)[:n_points].reshape(point_shape)
  return skill, pwm


def supported(pred_shape: tuple, ensemble_axis: int) -> bool:
  """Whether the kernel should be used for this problem.

  Opt-in via WBX_TPU_PALLAS_CRPS=1: the fused single-pass kernel halves HBM
  traffic versus the XLA sort+skill path, but it is compute-heavier
  (bitonic network ≈ 672 vector min/max per 2048 points). Measured on this
  class of chip, XLA's sort wins when effective HBM bandwidth is throttled
  (remote-attached devices); the kernel wins when the XLA path is
  bandwidth-bound at full HBM speed. Benchmark on your hardware.
  """
  import os

  if os.environ.get('WBX_TPU_PALLAS_CRPS') != '1':
    return False
  try:
    platform = jax.default_backend()
  except RuntimeError:
    return False
  if platform not in ('tpu',):
    return False
  m = pred_shape[ensemble_axis]
  return 2 <= m <= 128
