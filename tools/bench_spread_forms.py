"""A/B the CRPS spread kernel forms (pair enumeration vs bitonic/PWM sort).

``ops/crps_pairwise.py`` carries two kernel bodies for the spread sum
Σ_{i≠j}|x_i − x_j|: 'pairs' (O(m²) tile-ops, high ILP) and 'sort'
(O(m log² m) tile-ops as a bitonic min/max network + order-statistic
weighted sum). Which wins at which ensemble size is a hardware question;
this tool measures both on the REAL backend at the production 0.25° block
and prints ms/step per (m, form) so `_spread_form`'s default policy can be
set from data.

Methodology (see bench.py for the rationale):
* data is generated on-device — no tunnel transfer in the timed region;
* each measurement scans K perturbed steps inside ONE program — defeats
  the tunnel's (program, args) memoization and amortizes dispatch;
* a scalar is fetched to synchronize (block_until_ready does not wait on
  the axon backend).

Usage:
  python tools/bench_spread_forms.py 50 24 16 8
  WBX_AB_BLOCKS=256,512 python tools/bench_spread_forms.py 50   # lane sweep
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weatherbenchx_tpu.ops import crps_pairwise as cp  # noqa: E402

SHAPE = (4, 721, 1440)  # production 0.25° block: leads × lat × lon


def make_fn(m, form, k_iters):
  # form: 'pairs', 'sort' (default net), or 'sort:oem' / 'sort:bitonic'
  # to pin the sorting network (WBX_SPREAD_SORT_NET, read at trace time).
  base, _, net = form.partition(':')

  def body(x):
    saved = {k: os.environ.get(k)
             for k in ('WBX_SPREAD_FORM', 'WBX_SPREAD_SORT_NET')}
    os.environ['WBX_SPREAD_FORM'] = base  # read at trace time
    if net:
      os.environ['WBX_SPREAD_SORT_NET'] = net
    try:
      return cp._pairwise_spread_sum_impl(x, interpret=False)
    finally:
      for k, v in saved.items():
        if v is None:
          os.environ.pop(k, None)
        else:
          os.environ[k] = v

  @jax.jit
  def run(seed):
    x = jax.random.normal(jax.random.PRNGKey(0), (m,) + SHAPE, jnp.float32)

    def step(carry, k):
      y = body(x + (carry + k.astype(jnp.float32)) * 1e-6)
      return carry + y[0, 0, 0], None

    out, _ = lax.scan(step, seed, jnp.arange(k_iters, dtype=jnp.int32))
    return out

  return run


def compile_fn(m, form, k_iters=8):
  run = make_fn(m, form, k_iters)
  t0 = time.perf_counter()
  float(run(jnp.float32(0.0)))  # compile + 1st exec
  return run, time.perf_counter() - t0


def main():
  """Interleaved A/B: compile both forms once, then alternate single
  timed executions pairs/sort/pairs/sort… (WBX_AB_REPS per form, default
  9) and report MEDIAN and best per form. Interleaving + medians cancel
  the tunnel's run-to-run drift, which straddled the r3 best-of-3 deltas
  (ADVICE r3: the claimed ~9%% m=50 gain was within the stated spread)."""
  import statistics

  z = jnp.ones((8, 128))
  tiny = jax.jit(lambda a: a.sum())
  float(tiny(z))  # warm the tunnel/compile path
  lat = min(
      (lambda t0: (float(tiny(z + i)), time.perf_counter() - t0)[1])(
          time.perf_counter()) for i in range(5))
  print(f'backend={jax.default_backend()} latency ~{lat*1e3:.1f} ms')
  reps = int(os.environ.get('WBX_AB_REPS', '9'))
  forms = tuple(f for f in os.environ.get('WBX_AB_FORMS', '').split(',')
                if f.strip()) or ('pairs', 'sort')
  blocks = [int(b) for b in os.environ.get('WBX_AB_BLOCKS', '').split(',')
            if b.strip()]
  orig_block_shape = cp._block_shape
  k_iters = 8
  for m in (int(a) for a in sys.argv[1:] or ['50']):
    for bc in blocks or [None]:
      if bc is not None:
        cp._block_shape = lambda m_, r, c, _bc=bc: (
            orig_block_shape(m_, r, c)[0], min(-(-c // 128) * 128, _bc))
      try:
        runs = {}
        for form in forms:
          runs[form], cs = compile_fn(m, form, k_iters)
          print(f'# m={m} {form}: compile+1st {cs:.1f}s', flush=True)
        times = {form: [] for form in forms}
        for r in range(reps):
          for form in forms:
            t0 = time.perf_counter()
            float(runs[form](jnp.float32(r + 1.0)))
            times[form].append((time.perf_counter() - t0) / k_iters)
      finally:
        cp._block_shape = orig_block_shape
      tag = f' bc={bc}' if bc is not None else ''
      for form in forms:
        ts = times[form]
        print(f'm={m:3d} {form:5s}{tag}: median {1e3*statistics.median(ts):8.2f}'
              f' ms/step  best {1e3*min(ts):8.2f}  n={len(ts)}', flush=True)


if __name__ == '__main__':
  main()
