"""Pallas CRPS kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

from weatherbenchx_tpu.ops import crps as crps_ops


@pytest.mark.parametrize('m', [2, 5, 50, 64])
@pytest.mark.parametrize('n_points', [1, 100, 2048, 3000])
def test_skill_and_pwm_match_numpy(m, n_points):
  rng = np.random.default_rng(m * 1000 + n_points)
  pred = rng.standard_normal((m, n_points)).astype(np.float32)
  tgt = rng.standard_normal((n_points,)).astype(np.float32)
  skill, pwm = crps_ops.crps_skill_and_pwm(pred, tgt, interpret=True)
  expected_skill = np.abs(pred - tgt[None]).sum(0)
  s = np.sort(pred, axis=0)
  coeff = (2 * np.arange(1, m + 1) - m - 1)[:, None]
  expected_pwm = (coeff * s).sum(0)
  np.testing.assert_allclose(np.asarray(skill), expected_skill,
                             rtol=1e-5, atol=1e-4)
  np.testing.assert_allclose(np.asarray(pwm), expected_pwm,
                             rtol=1e-5, atol=1e-3)


def test_multidim_points():
  rng = np.random.default_rng(0)
  pred = rng.standard_normal((7, 3, 5, 11)).astype(np.float32)
  tgt = rng.standard_normal((3, 5, 11)).astype(np.float32)
  skill, pwm = crps_ops.crps_skill_and_pwm(pred, tgt, interpret=True)
  assert skill.shape == (3, 5, 11)
  np.testing.assert_allclose(
      np.asarray(skill), np.abs(pred - tgt[None]).sum(0), rtol=1e-5,
      atol=1e-4)


def test_ensemble_axis_not_first():
  rng = np.random.default_rng(1)
  pred = rng.standard_normal((4, 9, 6)).astype(np.float32)  # ens axis 1
  tgt = rng.standard_normal((4, 6)).astype(np.float32)
  skill, _ = crps_ops.crps_skill_and_pwm(pred, tgt, ensemble_axis=1,
                                         interpret=True)
  np.testing.assert_allclose(
      np.asarray(skill), np.abs(pred - tgt[:, None]).sum(1), rtol=1e-5,
      atol=1e-4)


def test_supported_gate():
  # On the CPU test backend the kernel must not be selected.
  assert not crps_ops.supported((50, 100), 0)


def test_bitonic_pairs_sorts():
  for n in [2, 4, 8, 64]:
    rng = np.random.default_rng(n)
    vals = list(rng.standard_normal(n))
    for i, j, ascending in crps_ops._bitonic_pairs(n):
      lo, hi = min(vals[i], vals[j]), max(vals[i], vals[j])
      vals[i], vals[j] = (lo, hi) if ascending else (hi, lo)
    assert vals == sorted(vals)
