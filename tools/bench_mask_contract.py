"""A/B the masked-aggregation contraction forms on the real TPU.

The production aggregation contraction is
``out[r, b] = sum_n z[r, n] * mask[b, n]`` with z = stat * area-weight
(f32, rows = stats x leads) and mask the 0/1 region-bin stack
(reference semantics: ``xr.dot(stat, *weights, *bin_masks)``,
/root/reference/weatherbenchX/aggregation.py:328). The shipped TPU
lowering is a fused broadcast-multiply + tree-reduce on the VPU
(darray.dot), which BASELINE.md shows is load-bound at 2*R*B*N element
loads. This tool measures the alternatives that move the contraction to
the MXU while keeping f32-grade accuracy:

* ``vpu``      — the shipped form (broadcast multiply + tree reduce).
* ``mxu2``     — manual split z = hi + lo into TWO bf16 operands; the
                 mask's 0/1 values are EXACT in bf16, so both partial
                 products are exact and the only error is the MXU's f32
                 accumulation order. 2 passes, bf16 operand reads.
* ``mxu2c``    — mxu2 with the contraction chunked over N and the chunk
                 partials tree-reduced in f32 on the VPU (bounds the
                 sequential-accumulation error independently of N).
* ``high``     — jnp.einsum precision=HIGH (3-pass bf16x3 emulation).
* ``highest``  — precision=HIGHEST (6-pass; the rank-histogram path).
* ``default``  — single-pass bf16 multiply (accuracy strawman).

Accuracy is reported against a float64 numpy contraction of the same
operands. Run on the real chip:

    python tools/bench_mask_contract.py [rows ...]   # default 4 80
"""

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

N_LAT, N_LON = 721, 1440
N_BINS = 34


def make_operands(rows):
  """Realistic operands: the bench's 34-bin region mask stack + area
  weights folded into a random stat block."""
  from weatherbenchx_tpu import binning, weighting
  from weatherbenchx_tpu.apps import configs as configs_lib
  from weatherbenchx_tpu.darray import DimArray

  lats = np.linspace(-90, 90, N_LAT)
  lons = np.linspace(0, 360, N_LON, endpoint=False)
  yy, xx = np.meshgrid(np.deg2rad(lats), np.deg2rad(lons), indexing='ij')
  land = (np.sin(3 * yy) * np.cos(4 * xx) > 0.1)
  land_da = DimArray(land, ('latitude', 'longitude'),
                     {'latitude': lats, 'longitude': lons})
  stat = DimArray(
      np.zeros((N_LAT, N_LON), np.float32), ('latitude', 'longitude'),
      {'latitude': lats, 'longitude': lons})
  regions = binning.Regions(configs_lib.REGIONS, land_sea_mask=land_da)
  mask = regions.create_bin_mask(stat)  # (region, lat, lon) bool
  m = np.asarray(mask.data).reshape(mask.shape[0], -1).astype(np.float32)
  assert m.shape[0] == N_BINS, m.shape
  w = weighting.GridAreaWeighting().weights(stat)
  w2d = np.broadcast_to(
      np.asarray(w.data).reshape(-1, 1).astype(np.float32), (N_LAT, N_LON))
  rng = np.random.default_rng(0)
  z = (rng.standard_normal((rows, N_LAT * N_LON)).astype(np.float32)
       * w2d.reshape(1, -1))
  return z, m


def f64_reference(z, m):
  return np.einsum('rn,bn->rb', z.astype(np.float64), m.astype(np.float64))


def errors(got, ref, z, m):
  """(plain max-rel, condition-normalized max err).

  Signed statistics (Error/Bias) cancel over a bin: |Σ z·m| can be ~1e3x
  smaller than Σ|z|·m, so plain rel-err vs f64 punishes EVERY f32 method
  (including the shipped VPU form) on ill-conditioned rows. The
  normalized metric divides by Σ|z|·m — the scale at which downstream
  means actually consume these sums (denominators are positive mask
  sums, numerators are compared at the reference's f32 scale)."""
  rel = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-30))
  scale = np.einsum('rn,bn->rb', np.abs(z).astype(np.float64),
                    m.astype(np.float64))
  norm = np.max(np.abs(got - ref) / np.maximum(scale, 1e-30))
  return rel, norm


def build(form, rows, n):
  m_holder = {}

  def contract(z, m):
    if form == 'vpu':
      return (z[:, None, :] * m[None, :, :]).sum(-1)
    if form in ('mxu2', 'mxu2c', 'mxu3'):
      zh = z.astype(jnp.bfloat16)
      r1 = z - zh.astype(jnp.float32)
      zl = r1.astype(jnp.bfloat16)
      mb = m.astype(jnp.bfloat16)
      if form in ('mxu2', 'mxu3'):
        def mm(a):
          return lax.dot_general(a, mb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        out = mm(zh) + mm(zl)
        if form == 'mxu3':
          zt = (r1 - zl.astype(jnp.float32)).astype(jnp.bfloat16)
          out = out + mm(zt)
        return out
      # chunked: bound the sequential f32 accumulation independent of N
      chunk = 128 * 1024
      pad = (-n) % chunk
      zh = jnp.pad(zh, ((0, 0), (0, pad)))
      zl = jnp.pad(zl, ((0, 0), (0, pad)))
      mbp = jnp.pad(mb, ((0, 0), (0, pad)))
      c = (n + pad) // chunk
      zh = zh.reshape(rows, c, chunk)
      zl = zl.reshape(rows, c, chunk)
      mbp = mbp.reshape(N_BINS, c, chunk)

      def mm(a):  # batched over chunks: (c, rows, chunk) x (c, chunk, b)
        return lax.dot_general(
            a.transpose(1, 0, 2), mbp.transpose(1, 2, 0),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
      parts = mm(zh) + mm(zl)              # (c, rows, b)
      return parts.sum(0)                  # f32 tree-reduce over chunks
    prec = {'high': lax.Precision.HIGH, 'highest': lax.Precision.HIGHEST,
            'default': lax.Precision.DEFAULT}[form]
    return jnp.einsum('rn,bn->rb', z, m, precision=prec)

  return contract


def main():
  rows_list = [int(a) for a in sys.argv[1:] or ['4', '80']]
  forms = tuple(f for f in os.environ.get(
      'WBX_AB_FORMS', 'vpu,mxu2,mxu2c,high,highest,default').split(',') if f)
  reps = int(os.environ.get('WBX_AB_REPS', '11'))
  k_iters = int(os.environ.get('WBX_AB_ITERS', '128'))

  # Tunnel latency floor.
  zz = jax.device_put(jnp.zeros(()))
  float(zz + 1)
  lat = min((time.perf_counter(), float(zz + i),
             time.perf_counter())[2] - 0 for i in range(1))  # warm only
  t0 = time.perf_counter()
  for i in range(5):
    float(zz + i)
  lat = (time.perf_counter() - t0) / 5
  print(f'backend={jax.default_backend()} latency ~{lat*1e3:.1f} ms')

  for rows in rows_list:
    z_np, m_np = make_operands(rows)
    ref = f64_reference(z_np, m_np)
    n = z_np.shape[1]
    z = jax.device_put(jnp.asarray(z_np))
    m = jax.device_put(jnp.asarray(m_np))
    for form in forms:
      contract = build(form, rows, n)

      # Accuracy: single evaluation vs f64.
      got = np.asarray(jax.jit(contract)(z, m), np.float64)
      rel, norm = errors(got, ref, z_np, m_np)

      @jax.jit
      def run(seed, z=z, m=m, contract=contract):
        def step(c, k):
          out = contract(z * (1.0 + 1e-6 * k), m)
          return c + out.sum(), ()
        tot, _ = lax.scan(step, seed * 0.0, seed + jnp.arange(k_iters))
        return tot

      tc0 = time.perf_counter()
      float(run(jnp.float32(1.0)))
      tc = time.perf_counter() - tc0
      ts = []
      for r in range(reps):
        t0 = time.perf_counter()
        float(run(jnp.float32(r + 2.0)))
        ts.append((time.perf_counter() - t0 - lat) / k_iters)
      print(f'rows={rows:3d} {form:8s}: median {1e3*statistics.median(ts):7.3f}'
            f' ms  best {1e3*min(ts):7.3f}  maxrel {rel:.2e}'
            f' norm {norm:.2e}  (compile+1st {tc:.1f}s)', flush=True)


if __name__ == '__main__':
  main()
