"""Pairwise CRPS-spread Pallas kernel: interpreter-mode correctness.

The compiled kernel runs only on a TPU backend; here the Pallas interpreter
executes the identical kernel program on CPU and is checked against both a
numpy brute-force pairwise sum and the sort/PWM form.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from weatherbenchx_tpu.ops import crps_pairwise


def brute_force(x):
  return np.abs(x[:, None, :] - x[None, :, :]).sum((0, 1))


class TestPairwiseSpreadSum:

  @pytest.mark.parametrize('m', [2, 3, 5, 8, 50])
  def test_matches_brute_force(self, m):
    rng = np.random.default_rng(m)
    x = rng.normal(size=(m, 300)).astype(np.float32)
    got = np.asarray(
        crps_pairwise.pairwise_spread_sum(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, brute_force(x), rtol=2e-5)

  def test_block_padding_boundary(self):
    # N spanning multiple blocks plus a ragged tail exercises the pad/slice.
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 2048 + 513)).astype(np.float32)
    got = np.asarray(
        crps_pairwise.pairwise_spread_sum(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, brute_force(x), rtol=2e-5)

  def test_nan_poisons_only_its_points(self):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(6, 64)).astype(np.float32)
    x[2, 10] = np.nan
    got = np.asarray(
        crps_pairwise.pairwise_spread_sum(jnp.asarray(x), interpret=True))
    assert np.isnan(got[10])
    keep = np.ones(64, bool)
    keep[10] = False
    np.testing.assert_allclose(got[keep], brute_force(x)[keep], rtol=2e-5)

  def test_matches_sort_pwm_form(self):
    rng = np.random.default_rng(2)
    m = 9
    x = rng.normal(size=(m, 500)).astype(np.float32)
    s = np.sort(x, axis=0)
    coeff = (2 * np.arange(1, m + 1) - m - 1)[:, None]
    pwm_pair_sum = 2 * (coeff * s).sum(0)
    got = np.asarray(
        crps_pairwise.pairwise_spread_sum(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, pwm_pair_sum, rtol=2e-5, atol=1e-4)

  def test_eval_shaped_5d_input(self):
    # (ensemble, init, lead, lat, lon) — the evaluator's native layout;
    # middle dims ride the grid as unit blocks, no reshape/retiling.
    rng = np.random.default_rng(7)
    x = rng.normal(size=(6, 1, 2, 9, 13)).astype(np.float32)
    got = np.asarray(
        crps_pairwise.pairwise_spread_sum(jnp.asarray(x), interpret=True))
    want = np.abs(x[:, None] - x[None, :]).sum((0, 1))
    assert got.shape == (1, 2, 9, 13)
    np.testing.assert_allclose(got, want, rtol=2e-5)

  def test_spread_sum_along_axis_restores_shape(self):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 6, 5)).astype(np.float32)
    got = np.asarray(
        crps_pairwise.spread_sum_along_axis(jnp.asarray(x), 1,
                                            interpret=True))
    want = np.abs(x[:, :, None, :] - x[:, None, :, :]).sum((1, 2))
    assert got.shape == (4, 5)
    np.testing.assert_allclose(got, want, rtol=2e-5)


class TestSpreadFormParity:
  """Both kernel bodies (pair enumeration and bitonic/PWM sort) must agree.

  ``_pairwise_spread_sum_impl`` is called directly (the public entry
  caches its jitted trace per (interpret, ndim), so an env flip after
  first use would silently keep the old form).
  """

  @pytest.mark.parametrize('net', ['oem', 'bitonic'])
  @pytest.mark.parametrize('m', [2, 3, 5, 8, 16, 24, 50])
  def test_forms_agree_with_nan(self, m, net, monkeypatch):
    monkeypatch.setenv('WBX_SPREAD_SORT_NET', net)
    rng = np.random.default_rng(m)
    x = rng.normal(size=(m, 9, 130)).astype(np.float32)
    x[m // 2, 3, 7] = np.nan  # poisoned gridpoint
    want = np.abs(x[:, None] - x[None, :]).sum((0, 1))
    outs = {}
    for form in ('pairs', 'sort'):
      monkeypatch.setenv('WBX_SPREAD_FORM', form)
      outs[form] = np.asarray(crps_pairwise._pairwise_spread_sum_impl(
          jnp.asarray(x), interpret=True))
    for form, got in outs.items():
      nan_mask = np.isnan(want)
      assert np.isnan(got[nan_mask]).all(), form
      np.testing.assert_allclose(got[~nan_mask], want[~nan_mask],
                                 rtol=2e-5, atol=1e-4, err_msg=form)

  @pytest.mark.parametrize('net', ['oem', 'bitonic'])
  def test_sort_form_odd_m_nan_every_position(self, net, monkeypatch):
    """Odd m: the median rank's PWM coefficient (2r-m-1) is ZERO, so 'the
    NaN row reaches some real output row' does not by itself poison the
    sum — the guarantee rests on the lone NaN DUPLICATING at its first
    real-vs-real compare-exchange (min and max both return NaN), after
    which at least one copy sits at a non-median rank. Exercise m=21
    (pads 21->32) with the NaN at EVERY member position, for BOTH
    sorting networks (odd-even merge default and bitonic)."""
    monkeypatch.setenv('WBX_SPREAD_FORM', 'sort')
    monkeypatch.setenv('WBX_SPREAD_SORT_NET', net)
    m = 21
    rng = np.random.default_rng(21)
    base = rng.normal(size=(m, 8, 128)).astype(np.float32)
    for pos in range(m):
      x = base.copy()
      x[pos, 2, 5] = np.nan
      got = np.asarray(crps_pairwise._pairwise_spread_sum_impl(
          jnp.asarray(x), interpret=True))
      assert np.isnan(got[2, 5]), f'NaN at member {pos} not propagated'
      want = np.abs(x[:, None] - x[None, :]).sum((0, 1))
      ok = ~np.isnan(want)
      np.testing.assert_allclose(got[ok], want[ok], rtol=2e-5, atol=1e-4)

  @pytest.mark.parametrize('net', ['oem', 'bitonic'])
  def test_sort_form_pads_sort_above_reals(self, net, monkeypatch):
    # Non-power-of-two m forces symbolic +inf pads; large magnitudes make
    # a mis-sorted pad row give a wildly wrong weighted sum.
    monkeypatch.setenv('WBX_SPREAD_FORM', 'sort')
    monkeypatch.setenv('WBX_SPREAD_SORT_NET', net)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(13, 8, 128)) * 1e6).astype(np.float32)
    got = np.asarray(crps_pairwise._pairwise_spread_sum_impl(
        jnp.asarray(x), interpret=True))
    want = np.abs(x[:, None] - x[None, :]).sum((0, 1))
    np.testing.assert_allclose(got, want, rtol=2e-5)

  def test_env_override_selects_form(self, monkeypatch):
    monkeypatch.setenv('WBX_SPREAD_FORM', 'sort')
    assert crps_pairwise._spread_form(2) == 'sort'
    monkeypatch.setenv('WBX_SPREAD_FORM', 'pairs')
    assert crps_pairwise._spread_form(50) == 'pairs'
    monkeypatch.delenv('WBX_SPREAD_FORM')
    # Measured v5e policy: sort at m >= 20, pairs below.
    assert crps_pairwise._spread_form(2) == 'pairs'
    assert crps_pairwise._spread_form(16) == 'pairs'
    assert crps_pairwise._spread_form(20) == 'sort'
    assert crps_pairwise._spread_form(50) == 'sort'


class TestShapeSweep:
  """Property sweep: odd ranks/extents around the tile boundaries."""

  @pytest.mark.parametrize('shape', [
      (2, 1),            # rank-1 rest, single point
      (3, 130),          # rank-1 rest crossing one lane tile
      (5, 1, 7),         # r < sublane tile
      (4, 9, 129),       # both trailing dims just past a tile edge
      (2, 1, 1, 300),    # mids of size 1
      (6, 3, 2, 8, 128), # two mids, exact tile
  ])
  def test_spread_arbitrary_shapes(self, shape):
    rng = np.random.default_rng(sum(shape))
    x = rng.normal(size=shape).astype(np.float32)
    got = np.asarray(
        crps_pairwise.pairwise_spread_sum(jnp.asarray(x), interpret=True))
    m = shape[0]
    flat = x.reshape(m, -1)
    want = brute_force(flat).reshape(shape[1:])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

  def test_spread_bf16(self):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 9, 129)).astype(np.float32)
    got = np.asarray(crps_pairwise.pairwise_spread_sum(
        jnp.asarray(x, jnp.bfloat16), interpret=True)).astype(np.float32)
    want = brute_force(x.reshape(4, -1)).reshape(9, 129)
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.5)


class TestPairwiseCrossSum:

  @pytest.mark.parametrize('mx,my', [(1, 1), (3, 5), (8, 2)])
  def test_matches_brute_force(self, mx, my):
    rng = np.random.default_rng(mx * 10 + my)
    x = rng.normal(size=(mx, 2, 9, 140)).astype(np.float32)
    y = rng.normal(size=(my, 2, 9, 140)).astype(np.float32)
    got = np.asarray(crps_pairwise.pairwise_cross_sum(
        jnp.asarray(x), jnp.asarray(y), interpret=True))
    want = np.abs(x[:, None] - y[None, :]).sum((0, 1))
    np.testing.assert_allclose(got, want, rtol=2e-5)

  def test_trailing_shape_mismatch_raises(self):
    x = jnp.zeros((2, 3, 4, 5), jnp.float32)
    y = jnp.zeros((2, 3, 4, 6), jnp.float32)
    with pytest.raises(ValueError, match='mismatch'):
      crps_pairwise.pairwise_cross_sum(x, y, interpret=True)

  def test_skill_statistic_matches_broadcast(self, monkeypatch):
    from weatherbenchx_tpu.darray import DimArray
    from weatherbenchx_tpu.metrics import probabilistic

    rng = np.random.default_rng(0)
    dims = ('number', 'lead_time', 'latitude', 'longitude')
    pred = DimArray(rng.normal(size=(5, 3, 8, 10)).astype(np.float32), dims,
                    {'number': np.arange(5)})
    tgt = DimArray(rng.normal(size=(4, 3, 8, 10)).astype(np.float32), dims,
                   {'number': np.arange(4)})
    stat = probabilistic.CRPSSkill()

    monkeypatch.setenv('WBX_NO_PALLAS', '1')
    want = np.asarray(stat._compute_per_variable(pred, tgt).values)
    monkeypatch.delenv('WBX_NO_PALLAS')
    monkeypatch.setenv('WBX_PALLAS_INTERPRET', '1')
    got_da = stat._compute_per_variable(pred, tgt)
    assert got_da.dims == ('lead_time', 'latitude', 'longitude')
    np.testing.assert_allclose(np.asarray(got_da.values), want,
                               rtol=1e-5, atol=1e-6)


class TestCrossCoordPropagation:

  def test_target_mask_coord_survives_kernel_path(self, monkeypatch):
    from weatherbenchx_tpu.darray import Coord, DimArray
    from weatherbenchx_tpu.metrics import probabilistic

    rng = np.random.default_rng(0)
    dims = ('number', 'lead_time', 'latitude', 'longitude')
    pred = DimArray(rng.normal(size=(3, 2, 4, 5)).astype(np.float32), dims,
                    {'number': np.arange(3)})
    mask = Coord(('latitude', 'longitude'),
                 (rng.random((4, 5)) > 0.5))
    tgt = DimArray(rng.normal(size=(2, 2, 4, 5)).astype(np.float32), dims,
                   {'number': np.arange(2), 'mask': mask})
    monkeypatch.setenv('WBX_PALLAS_INTERPRET', '1')
    out = probabilistic.CRPSSkill()._compute_per_variable(pred, tgt)
    assert 'mask' in out.coords
    np.testing.assert_array_equal(np.asarray(out.coords['mask'].values),
                                  np.asarray(mask.values))


class TestMetricIntegration:
  """CRPSSpread's kernel selection path, driven on CPU via the interpreter."""

  @pytest.mark.parametrize('fair', [True, False])
  @pytest.mark.parametrize('which', ['predictions', 'targets'])
  def test_spread_statistic_matches_sort(self, fair, which, monkeypatch):
    from weatherbenchx_tpu.darray import DimArray
    from weatherbenchx_tpu.metrics import probabilistic

    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 3, 8, 10)).astype(np.float32)
    dims = ('number', 'lead_time', 'latitude', 'longitude')
    pred = DimArray(x, dims, {'number': np.arange(7)})
    tgt = DimArray(rng.normal(size=(7, 3, 8, 10)).astype(np.float32), dims,
                   {'number': np.arange(7)})
    stat = probabilistic.CRPSSpread(use_sort=True, fair=fair, which=which)

    monkeypatch.setenv('WBX_NO_PALLAS', '1')
    want = np.asarray(stat._compute_per_variable(pred, tgt).values)
    monkeypatch.delenv('WBX_NO_PALLAS')
    monkeypatch.setenv('WBX_PALLAS_INTERPRET', '1')
    got_da = stat._compute_per_variable(pred, tgt)
    got = np.asarray(got_da.values)
    assert got_da.dims == ('lead_time', 'latitude', 'longitude')
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestShardedPartitioning:
  """The kernel's GSPMD rule: data dims shard, the member axis replicates."""

  @pytest.mark.parametrize('spec', [
      (None, 'lead', 'space', None),   # evaluator layout: members together
      ('lead', None, 'space', None),   # member axis sharded -> forced gather
  ])
  def test_sharded_jit_matches_unsharded(self, spec):
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ('lead', 'space'))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 4, 16, 128)).astype(np.float32)
    want = brute_force(x.reshape(8, -1)).reshape(4, 16, 128)
    xd = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, PartitionSpec(*spec)))
    f = jax.jit(lambda a: crps_pairwise.pairwise_spread_sum(a,
                                                            interpret=True))
    got = np.asarray(f(xd))
    np.testing.assert_allclose(got, want, rtol=2e-5)
    out_spec = tuple(f(xd).sharding.spec)
    assert 'space' in out_spec  # data-dim sharding propagated, not replicated


class TestSupportGating:

  def test_rejects_small_or_wide(self):
    assert not crps_pairwise.supported(1, jnp.float32)
    assert not crps_pairwise.supported(50, jnp.float64)
    # implausibly large ensembles fall back to sort
    assert not crps_pairwise.supported(1_000_000, jnp.float32)

  def test_cpu_backend_not_selected(self):
    # conftest pins the cpu platform, so the compiled path must decline.
    assert not crps_pairwise.supported(50, jnp.float32)

  def test_block_shrinks_with_members(self):
    br50, bc50 = crps_pairwise._block_shape(50, 721, 1440)
    br150, bc150 = crps_pairwise._block_shape(150, 721, 1440)
    assert br50 * bc50 * 50 <= crps_pairwise._BLOCK_ELEMS
    assert br150 * bc150 <= br50 * bc50

  @pytest.mark.parametrize('m', [2, 8, 16, 31, 32, 50, 200])
  @pytest.mark.parametrize('r,c', [(721, 1440), (3, 1440), (721, 64),
                                   (1, 1), (8, 128)])
  def test_block_shape_invariants(self, m, r, c):
    br, bc = crps_pairwise._block_shape(m, r, c)
    assert 1 <= br <= max(r, 1)
    assert bc >= 128 or c <= bc          # full lanes unless c is smaller
    assert bc % 128 == 0
    assert m * br * bc <= max(crps_pairwise._BLOCK_ELEMS, m * 8 * 128)
    if m >= 32:
      # large ensembles pin the measured-fastest compact tile that still
      # fits the VMEM budget
      want_bc = 256 if m * 8 * 256 <= crps_pairwise._BLOCK_ELEMS else 128
      assert (br, bc) == (max(min(8, r), 1),
                          min(-(-c // 128) * 128, want_bc))


class TestEnsembleOnlyInputs:
  """ndim==1 inputs skip the custom partitioner (its einsum-style sharding
  rule would have no data factors) and use the plain jnp fallback."""

  def test_spread_1d(self):
    x = np.random.default_rng(0).standard_normal(7).astype(np.float32)
    expected = np.abs(x[:, None] - x[None, :]).sum()
    got = crps_pairwise.pairwise_spread_sum(jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)

  def test_cross_1d(self):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(5).astype(np.float32)
    y = rng.standard_normal(3).astype(np.float32)
    expected = np.abs(x[:, None] - y[None, :]).sum()
    got = crps_pairwise.pairwise_cross_sum(
        jnp.asarray(x), jnp.asarray(y), interpret=True)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)
