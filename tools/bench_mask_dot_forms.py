"""A/B of lowerings for the masked aggregation contraction (round 5).

out[r, b] = sum_K z[r, K] * mask[b, K]   (z f32, mask 0/1)

Forms:
  vpu      broadcast multiply + tree reduce (round-3 default, few-bin shapes)
  hi       einsum Precision.HIGHEST        (round-3 default, matmul shapes)
  split3   manual 3-term bf16 Dekker split, materialized in HBM (round 4,
           darray._mask_mxu_dot — the BENCH_r04 regression)
  x3       lax.dot_general with DotAlgorithmPreset.BF16_BF16_F32_X3 —
           XLA's native 3-pass bf16 emulation inside the MXU pipeline,
           no materialization (VERDICT r4 next-step 1)
  x6       BF16_BF16_F32_X6 (f32-grade, 6 passes) for the accuracy anchor

Reports ms/step (scan-of-K, latency-subtracted) and max rel err vs a
float64 host reference, per shape. Run on the real chip.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def time_form(fn, args, k_iters=32):
  """Scan k_iters applications in one dispatch; min of 3, latency-sub."""
  def scan_fn(ops, ks):
    def step(c, k):
      out = fn(*[o + 0e0 * k if o.dtype.kind == 'f' else o for o in ops])
      return c + out.sum(), ()
    tot, _ = lax.scan(step, jnp.zeros((), jnp.float32), ks)
    return tot
  jfn = jax.jit(scan_fn)
  ks = jnp.arange(1.0, k_iters + 1.0)
  dev_args = jax.device_put(args)
  float(jfn(dev_args, ks))  # compile
  tiny = jax.jit(lambda v: v + 1)
  z = jax.device_put(jnp.zeros(()))
  float(tiny(z))
  lats = []
  for i in range(5):
    t0 = time.perf_counter()
    float(tiny(z + i))
    lats.append(time.perf_counter() - t0)
  latency = sorted(lats)[2]
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    float(jfn(dev_args, ks))
    best = min(best, time.perf_counter() - t0)
  return max(best - latency, 1e-9) / k_iters * 1e3  # ms/step


def forms(n_bins):
  dn = (((1,), (1,)), ((), ()))

  def vpu(z, mf):
    return (z[:, None, :] * mf[None, :, :]).sum(-1)

  def hi(z, mf):
    return jnp.einsum('rk,bk->rb', z, mf,
                      precision=jax.lax.Precision.HIGHEST)

  def split3(z, mf):
    m = mf.astype(jnp.bfloat16)
    zh = z.astype(jnp.bfloat16)
    r1 = z - zh.astype(jnp.float32)
    zl = r1.astype(jnp.bfloat16)
    zt = (r1 - zl.astype(jnp.float32)).astype(jnp.bfloat16)
    mm = lambda a: lax.dot_general(a, m, dn,
                                   preferred_element_type=jnp.float32)
    return mm(zh) + mm(zl) + mm(zt)

  def x3(z, mf):
    return lax.dot_general(z, mf, dn,
                           precision=lax.DotAlgorithmPreset.BF16_BF16_F32_X3,
                           preferred_element_type=jnp.float32)

  def x6(z, mf):
    return lax.dot_general(z, mf, dn,
                           precision=lax.DotAlgorithmPreset.BF16_BF16_F32_X6,
                           preferred_element_type=jnp.float32)

  return {'vpu': vpu, 'hi': hi, 'split3': split3, 'x3': x3, 'x6': x6}


def main():
  kk = 721 * 1440
  n_bins = 34
  rng = np.random.default_rng(0)
  # Region-like masks: 17 lat/lon boxes + land-ish + global, stacked to 34.
  mask = rng.random((n_bins, kk)) < rng.random((n_bins, 1)) * 0.9 + 0.05
  mask[0] = True
  mf = mask.astype(np.float32)
  print(f'backend={jax.default_backend()} K={kk} bins={n_bins}',
        flush=True)
  only = set(sys.argv[1:]) if len(sys.argv) > 1 else None
  for rows in (8, 80, 204, 408):
    z = rng.standard_normal((rows, kk)).astype(np.float32)
    want = z.astype(np.float64) @ mf.astype(np.float64).T
    scale = np.maximum(np.abs(want), np.abs(z).astype(np.float64) @
                       mf.astype(np.float64).T * 0 + 1.0)
    res = {}
    for name, fn in forms(n_bins).items():
      if only and name not in only:
        continue
      try:
        got = np.asarray(jax.jit(fn)(z, mf), np.float64)
        err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e3))
        ms = time_form(fn, (jnp.asarray(z), jnp.asarray(mf)))
        res[name] = (ms, err)
        print(f'rows={rows:4d} {name:7s} {ms:8.3f} ms  maxrel={err:.2e}',
              flush=True)
      except Exception as e:
        print(f'rows={rows:4d} {name:7s} FAILED: {type(e).__name__}: {e}',
              flush=True)
  print('done')


if __name__ == '__main__':
  main()
