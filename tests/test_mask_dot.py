"""Tests for the MXU 0/1-mask contraction path and same-layout batching.

The production aggregation contraction (reference semantics:
``xr.dot(stat, *weights, *bin_masks, dim=reduce_dims)``,
/root/reference/weatherbenchX/aggregation.py:290-328) detects the bool
bin-mask operand in ``darray.dot`` and lowers to an exact 3-term bf16
split on the MXU (``darray._mask_mxu_dot``); ``Aggregator.
aggregate_statistics`` batches same-layout (statistic, variable,
num/den) contractions into one ``darray.dot_batched`` call. Both paths
are TPU-gated in production; ``WBX_MASK_DOT=force`` / ``WBX_AGG_BATCH=
force`` exercise the lowerings on the CPU suite.
"""

import numpy as np
import pytest

from weatherbenchx_tpu import aggregation, binning, darray, weighting
from weatherbenchx_tpu.darray import DimArray


def _rel(a, b):
  a = np.asarray(a, np.float64)
  b = np.asarray(b, np.float64)
  return float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-9)))


def _mk(seed, shape, dims, **coords):
  rng = np.random.default_rng(seed)
  return DimArray(rng.standard_normal(shape).astype(np.float32), dims,
                  coords or None)


class TestMaskMxuDot:

  def setup_method(self):
    self.w = DimArray(
        np.abs(np.random.default_rng(9).standard_normal(37)
               ).astype(np.float32), ('lat',))
    self.m = DimArray(
        np.random.default_rng(8).random((5, 37, 72)) > 0.4,
        ('bin', 'lat', 'lon'))

  def _both(self, *arrays, dim, monkeypatch):
    monkeypatch.setenv('WBX_MASK_DOT', 'off')
    ref = darray.dot(*arrays, dim=dim)
    monkeypatch.setenv('WBX_MASK_DOT', 'force')
    got = darray.dot(*arrays, dim=dim)
    assert got.dims == ref.dims
    assert got.shape == ref.shape
    return got, ref

  def test_matches_einsum(self, monkeypatch):
    stat = _mk(0, (4, 37, 72), ('lead', 'lat', 'lon'))
    got, ref = self._both(stat, self.w, self.m, dim=('lat', 'lon'),
                          monkeypatch=monkeypatch)
    assert _rel(got.data, ref.data) < 1e-5

  def test_contraction_dim_missing_from_mask(self, monkeypatch):
    # init is reduced but the mask broadcasts over it: z pre-reduces.
    # Cancellation-heavy sums (8k random-sign terms) make PLAIN rel-err
    # compare two f32 rounding walks against each other, so tolerate at
    # the output's magnitude scale too.
    stat = _mk(1, (3, 4, 37, 72), ('init', 'lead', 'lat', 'lon'))
    got, ref = self._both(stat, self.w, self.m,
                          dim=('init', 'lat', 'lon'),
                          monkeypatch=monkeypatch)
    scale = float(np.max(np.abs(np.asarray(ref.data))))
    np.testing.assert_allclose(np.asarray(got.data), np.asarray(ref.data),
                               rtol=1e-5, atol=1e-6 * scale)

  def test_nan_poisons_all_bins_like_reference_path(self, monkeypatch):
    stat = _mk(2, (4, 37, 72), ('lead', 'lat', 'lon'))
    d = np.asarray(stat.data).copy()
    d[1, 3, 5] = np.nan
    stat = stat.copy(data=d)
    got, ref = self._both(stat, self.w, self.m, dim=('lat', 'lon'),
                          monkeypatch=monkeypatch)
    assert np.array_equal(np.isnan(np.asarray(got.data)),
                          np.isnan(np.asarray(ref.data)))
    ok = ~np.isnan(np.asarray(ref.data))
    assert _rel(np.asarray(got.data)[ok], np.asarray(ref.data)[ok]) < 1e-5

  def test_bool_fold_operand(self, monkeypatch):
    # A second bool operand WITHOUT exclusive out dims folds into z
    # exactly (0/1 x f32); only the bin mask rides the MXU columns.
    stat = _mk(3, (4, 37, 72), ('lead', 'lat', 'lon'))
    valid = DimArray(np.random.default_rng(4).random((37, 72)) > 0.2,
                     ('lat', 'lon'))
    got, ref = self._both(stat, self.w, valid, self.m, dim=('lat', 'lon'),
                          monkeypatch=monkeypatch)
    assert _rel(got.data, ref.data) < 1e-5

  def test_two_bin_masks_fall_back(self, monkeypatch):
    # Two bool operands with their own out dims: candidate must bail
    # (force included) and results still match.
    stat = _mk(5, (4, 37, 72), ('lead', 'lat', 'lon'))
    m2 = DimArray(np.random.default_rng(6).random((3, 37)) > 0.5,
                  ('latbin', 'lat'))
    got, ref = self._both(stat, self.w, self.m, m2, dim=('lat', 'lon'),
                          monkeypatch=monkeypatch)
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(ref.data))

  def test_out_dim_order_interleaved(self, monkeypatch):
    # Mask out-dim appears BEFORE a row dim in xarray broadcast order:
    # the (rows, bins) matmul result must transpose back.
    stat = _mk(7, (37, 72, 4), ('lat', 'lon', 'lead'))
    got, ref = self._both(self.m, stat, self.w, dim=('lat', 'lon'),
                          monkeypatch=monkeypatch)
    assert ref.dims == ('bin', 'lead')
    assert _rel(got.data, ref.data) < 1e-5

  def test_multi_out_dim_mask(self, monkeypatch):
    m = DimArray(np.random.default_rng(10).random((3, 2, 37, 72)) > 0.5,
                 ('b1', 'b2', 'lat', 'lon'))
    stat = _mk(11, (4, 37, 72), ('lead', 'lat', 'lon'))
    got, ref = self._both(stat, self.w, m, dim=('lat', 'lon'),
                          monkeypatch=monkeypatch)
    assert ref.dims == ('lead', 'b1', 'b2')
    assert _rel(got.data, ref.data) < 1e-5

  def test_cancellation_heavy_rows_stay_f32_grade(self, monkeypatch):
    """The 3-term split must hold 1e-5 RELATIVE error on bins whose sum
    cancels (Bias over a region of random-sign error) — the case a
    2-term bf16 split (~2^-17 absolute) measurably fails."""
    rng = np.random.default_rng(12)
    z = rng.standard_normal((8, 64, 128)).astype(np.float32)
    stat = DimArray(z, ('lead', 'lat', 'lon'))
    m = DimArray(rng.random((6, 64, 128)) > 0.3, ('bin', 'lat', 'lon'))
    f64 = np.einsum('rij,bij->rb', z.astype(np.float64),
                    np.asarray(m.data).astype(np.float64))
    monkeypatch.setenv('WBX_MASK_DOT', 'force')
    got = np.asarray(darray.dot(stat, m, dim=('lat', 'lon')).data,
                     np.float64)
    assert np.max(np.abs(got - f64) / np.maximum(np.abs(f64), 1e-9)) < 1e-5


class TestMaskMxuSharded:
  """The MXU mask path under GSPMD: contraction dims sharded over the
  8-device CPU mesh must psum to the unsharded result (the v5e pod
  layout shards lat/lon data dims; bins replicate)."""

  def test_sharded_jit_matches_unsharded(self, monkeypatch):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    monkeypatch.setenv('WBX_MASK_DOT', 'force')
    mesh = Mesh(np.array(jax.devices()[:8]), ('space',))
    rng = np.random.default_rng(3)
    stat = DimArray(rng.standard_normal((4, 16, 128)).astype(np.float32),
                    ('lead', 'lat', 'lon'))
    m = DimArray(rng.random((5, 16, 128)) > 0.4, ('bin', 'lat', 'lon'))
    w = DimArray(np.abs(rng.standard_normal(16)).astype(np.float32),
                 ('lat',))

    def contract(s_data, m_data, w_data):
      s = DimArray(s_data, stat.dims)
      mm = DimArray(m_data, m.dims)
      ww = DimArray(w_data, w.dims)
      return darray.dot(s, ww, mm, dim=('lat', 'lon')).data

    want = np.asarray(jax.jit(contract)(
        jnp.asarray(stat.data), jnp.asarray(m.data), jnp.asarray(w.data)))
    sd = jax.device_put(jnp.asarray(stat.data),
                        NamedSharding(mesh, PartitionSpec(None, 'space')))
    md = jax.device_put(jnp.asarray(m.data),
                        NamedSharding(mesh, PartitionSpec(None, 'space')))
    wd = jax.device_put(jnp.asarray(w.data),
                        NamedSharding(mesh, PartitionSpec('space')))
    got = np.asarray(jax.jit(contract)(sd, md, wd))
    np.testing.assert_allclose(got, want, rtol=1e-5,
                               atol=1e-6 * np.max(np.abs(want)))


class TestDotBatched:

  def test_matches_per_item_dot(self):
    w = DimArray(np.abs(np.random.default_rng(0).standard_normal(19)
                        ).astype(np.float32), ('lat',))
    m = DimArray(np.random.default_rng(1).random((5, 19, 23)) > 0.4,
                 ('bin', 'lat', 'lon'))
    stats = [_mk(i, (4, 19, 23), ('lead', 'lat', 'lon')) for i in range(6)]
    singles = [darray.dot(s, w, m, dim=('lat', 'lon')) for s in stats]
    batched = darray.dot_batched(stats, w, m, dim=('lat', 'lon'))
    assert len(batched) == 6
    for a, b in zip(singles, batched):
      assert a.dims == b.dims
      scale = float(np.max(np.abs(np.asarray(a.data))))
      np.testing.assert_allclose(np.asarray(b.data), np.asarray(a.data),
                                 rtol=1e-5, atol=1e-6 * scale)

  def test_rejects_mixed_layouts(self):
    a = _mk(0, (4, 19), ('lead', 'lat'))
    b = _mk(1, (19, 4), ('lat', 'lead'))
    with pytest.raises(ValueError, match='identical dims/shape'):
      darray.dot_batched([a, b], dim=('lat',))

  def test_single_and_empty(self):
    a = _mk(0, (4, 19), ('lead', 'lat'))
    assert darray.dot_batched([], dim=('lat',)) == []
    (out,) = darray.dot_batched([a], dim=('lat',))
    ref = darray.dot(a, dim=('lat',))
    np.testing.assert_array_equal(np.asarray(out.data),
                                  np.asarray(ref.data))


class TestAggregatorBatching:

  def _setup(self, masked=False, skipna=False):
    nlat, nlon = 13, 24
    lats = np.linspace(-90, 90, nlat)
    lons = np.linspace(0, 360, nlon, endpoint=False)
    coords = {'latitude': lats, 'longitude': lons}
    rng = np.random.default_rng(0)

    def da(seed, with_nan=False, extra_level=False):
      r = np.random.default_rng(seed)
      shape = (2, nlat, nlon) if not extra_level else (2, 3, nlat, nlon)
      dims = (('lead_time', 'latitude', 'longitude') if not extra_level
              else ('lead_time', 'level', 'latitude', 'longitude'))
      v = r.standard_normal(shape).astype(np.float32)
      if with_nan:
        v[(0,) * (v.ndim - 2) + (1, 2)] = np.nan
      c = dict(coords)
      if masked:
        c['mask'] = (dims[-2:], r.random(shape[-2:]) > 0.2)
      return DimArray(v, dims, c)

    land = DimArray(rng.random((nlat, nlon)) > 0.5,
                    ('latitude', 'longitude'), coords)
    regions = {'global': ((-90.0, 90.0), (0.0, 360.0)),
               'tropics': ((-20.0, 20.0), (0.0, 360.0))}
    agg = aggregation.Aggregator(
        reduce_dims=['latitude', 'longitude'],
        bin_by=[binning.Regions(regions, land_sea_mask=land)],
        weigh_by=[weighting.GridAreaWeighting()],
        masked=masked, skipna=skipna)
    stats = {
        'se': {'a': da(1), 'b': da(2, with_nan=skipna)},
        'err': {'a': da(3), 'b': da(4)},
        # a different layout in the same family: groups must not mix
        'lvl': {'a': da(5, extra_level=True)},
    }
    return agg, stats

  @pytest.mark.parametrize('masked,skipna',
                           [(False, False), (True, False),
                            (True, True), (False, True)])
  def test_batched_equals_unbatched(self, masked, skipna, monkeypatch):
    agg, stats = self._setup(masked=masked, skipna=skipna)
    monkeypatch.setenv('WBX_AGG_BATCH', 'off')
    ref = agg.aggregate_statistics(stats)
    monkeypatch.setenv('WBX_AGG_BATCH', 'force')
    got = agg.aggregate_statistics(stats)
    for side in ('sum_weighted_statistics', 'sum_weights'):
      r, g = getattr(ref, side), getattr(got, side)
      assert set(r) == set(g)
      for name in r:
        assert set(r[name]) == set(g[name])
        for var in r[name]:
          ra, ga = r[name][var], g[name][var]
          assert ra.dims == ga.dims
          rv, gv = np.asarray(ra.data), np.asarray(ga.data)
          ok = ~np.isnan(rv)
          assert np.array_equal(ok, ~np.isnan(gv))
          np.testing.assert_allclose(gv[ok], rv[ok], rtol=1e-5, atol=1e-7)

  def test_batched_with_forced_mxu(self, monkeypatch):
    # Both new paths together: grouped rows through the MXU lowering.
    agg, stats = self._setup(masked=True)
    monkeypatch.setenv('WBX_AGG_BATCH', 'off')
    monkeypatch.setenv('WBX_MASK_DOT', 'off')
    ref = agg.aggregate_statistics(stats)
    monkeypatch.setenv('WBX_AGG_BATCH', 'force')
    monkeypatch.setenv('WBX_MASK_DOT', 'force')
    got = agg.aggregate_statistics(stats)
    r = ref.sum_weighted_statistics['se']['a']
    g = got.sum_weighted_statistics['se']['a']
    np.testing.assert_allclose(np.asarray(g.data), np.asarray(r.data),
                               rtol=1e-5, atol=1e-7)

  def test_metric_values_end_to_end(self, monkeypatch):
    # finalize through metric_values so output coords survive batching
    from weatherbenchx_tpu.metrics import deterministic
    agg, _ = self._setup(masked=False)
    nlat, nlon = 13, 24
    coords = {'latitude': np.linspace(-90, 90, nlat),
              'longitude': np.linspace(0, 360, nlon, endpoint=False)}
    dims = ('lead_time', 'latitude', 'longitude')
    rng = np.random.default_rng(7)
    p = {'a': DimArray(rng.standard_normal((2, nlat, nlon)
                                           ).astype(np.float32),
                       dims, coords)}
    t = {'a': DimArray(rng.standard_normal((2, nlat, nlon)
                                           ).astype(np.float32),
                       dims, coords)}
    metrics = {'rmse': deterministic.RMSE(), 'bias': deterministic.Bias()}
    monkeypatch.setenv('WBX_AGG_BATCH', 'off')
    ref = aggregation.compute_metric_values_for_single_chunk(
        metrics, agg, p, t)
    monkeypatch.setenv('WBX_AGG_BATCH', 'force')
    got = aggregation.compute_metric_values_for_single_chunk(
        metrics, agg, p, t)
    assert set(ref) == set(got)
    for k in ref:
      assert got[k].dims == ref[k].dims
      assert sorted(got[k].coords) == sorted(ref[k].coords)
      np.testing.assert_allclose(np.asarray(got[k].data),
                                 np.asarray(ref[k].data),
                                 rtol=1e-5, atol=1e-7)

  def test_operands_stay_bool(self):
    # prepare_operands must keep bin masks bool (the MXU trigger and the
    # 4x smaller device copy).
    import jax
    agg, stats = self._setup()
    abstract = {
        name: {var: DimArray(
            jax.ShapeDtypeStruct(s.shape, s.dtype), s.dims, s.coords)
            for var, s in per.items()}
        for name, per in stats.items()}
    ops = agg.prepare_operands(abstract)
    kinds = {np.dtype(o.dtype).kind for o in ops['se']['a']}
    assert 'b' in kinds, kinds  # the Regions mask
    assert 'f' in kinds, kinds  # the area weights
