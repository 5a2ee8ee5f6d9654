"""Randomized reference-parity sweep on the REAL backend.

The CI parity suite (``tests/test_reference_parity.py``) is pinned to CPU
by ``tests/conftest.py``, so it can never see TPU-only numerics (MXU
default-precision multiplies, Pallas kernel accumulation order, remote
codegen differences). This tool runs the same seeded randomized configs —
random metric subset × reduce dims × binning stack × weighting × skipna ×
NaN pattern, compared against the ACTUAL upstream reference code via
tools/refshim — on whatever backend ``jax.default_backend()`` resolves to
(the tunneled TPU in this environment).

History: a 200-seed sweep on the v5e found 101 configs outside 1e-5 —
every one traced to the aggregation einsum running at the MXU's default
(bf16-multiply) precision; ``darray.dot`` now pins
``precision=HIGHEST`` and the sweep passes clean. Keep running this after
any change to device-side numerics (kernels, aggregation, interpolation).

Usage:
  python tools/tpu_parity_fuzz.py --seeds 200
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--seeds', type=int, default=200)
  p.add_argument('--max_report', type=int, default=5)
  args = p.parse_args()

  import jax
  import test_reference_parity as parity

  ref = parity._import_reference()
  fuzz = parity.TestRandomizedConfigParity()
  t0 = time.perf_counter()
  failures = []
  for family, fn in (('config', fuzz.test_random_config),
                     ('seeps', fuzz.test_random_seeps_config),
                     ('spatial_rank', fuzz.test_random_spatial_rank_config),
                     ('wrappers', fuzz.test_random_wrapper_config)):
    for seed in range(args.seeds):
      try:
        fn(ref, seed)
      except Exception as e:  # noqa: BLE001 — collect, report, exit nonzero
        failures.append({'family': family, 'seed': seed,
                         'error': f'{type(e).__name__}: ' + str(e)[:300]})
  print(json.dumps({
      'metric': 'tpu_parity_fuzz',
      'backend': jax.default_backend(),
      'seeds': args.seeds,
      'failures': len(failures),
      'wall_s': round(time.perf_counter() - t0, 1),
      'first_failures': failures[:args.max_report],
  }))
  sys.exit(1 if failures else 0)


if __name__ == '__main__':
  main()
