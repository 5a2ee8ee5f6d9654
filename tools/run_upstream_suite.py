"""Counted pass/skip report for the upstream test suite run over the refshim.

Runs every module in tests/test_upstream_suite.py's manifest and prints a
markdown table (for docs/reference_parity.md) plus one JSON summary line.

Usage:
  python tools/run_upstream_suite.py
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, 'tests'))

import test_upstream_suite as ups  # noqa: E402


def main():
  rows = []
  total_ran = total_skipped = total_failed = 0
  for module in ups.MODULES:
    t0 = time.perf_counter()
    ran, skipped, problems = ups.run_upstream_module(module)
    dt = time.perf_counter() - t0
    rows.append((module, ran, len(skipped), len(problems), dt))
    total_ran += ran
    total_skipped += len(skipped)
    total_failed += len(problems)
    for cid, reason in skipped:
      print(f'#   skip {module}:{cid}: {reason}', file=sys.stderr)
    for cid, tb in problems:
      print(f'#   FAIL {module}:{cid}', file=sys.stderr)

  print('| upstream test module | ran | skipped | failed | seconds |')
  print('|---|---|---|---|---|')
  for module, ran, nskip, nfail, dt in rows:
    print(f'| `{module}` | {ran} | {nskip} | {nfail} | {dt:.1f} |')
  for module, reason in ups.EXCLUDED_MODULES.items():
    print(f'| `{module}` | — | excluded | — | — |')
  print(f'| **total** | **{total_ran}** | **{total_skipped}** | '
        f'**{total_failed}** | |')
  print(json.dumps({
      'metric': 'upstream_suite',
      'modules': len(rows),
      'ran': total_ran,
      'skipped': total_skipped,
      'failed': total_failed,
  }))


if __name__ == '__main__':
  main()
