import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherbenchx_tpu import darray
from weatherbenchx_tpu.darray import Coord, DimArray


def make(shape=(2, 3), dims=('x', 'y'), seed=0):
  rng = np.random.RandomState(seed)
  data = rng.randn(*shape)
  coords = {d: np.arange(s) * 1.0 for d, s in zip(dims, shape)}
  return DimArray(data, dims, coords)


class TestBasics:
  def test_construction(self):
    da = make()
    assert da.dims == ('x', 'y')
    assert da.shape == (2, 3)
    assert da.sizes == {'x': 2, 'y': 3}
    np.testing.assert_array_equal(da.coord_values('x'), [0.0, 1.0])

  def test_scalar(self):
    da = DimArray(5.0)
    assert da.dims == ()
    assert da.item() == 5.0

  def test_dim_mismatch_raises(self):
    with pytest.raises(ValueError):
      DimArray(np.zeros((2, 3)), ('x',))

  def test_tuple_coord_forms(self):
    # (dims, values) pair — dims must name real parent dims.
    da = DimArray(np.zeros(2), ('x',), {'c': (('x',), [10, 20])})
    np.testing.assert_array_equal(da.coord_values('c'), [10, 20])
    assert da.coords['c'].dims == ('x',)
    # A 2-tuple of plain VALUES (xarray-ism) must not be misparsed as a
    # (dims, values) pair with bogus dims.
    da = DimArray(np.zeros(2), ('x',), {'animal': ('cat', 'dog')})
    np.testing.assert_array_equal(da.coord_values('animal'),
                                  ['cat', 'dog'])
    assert da.coords['animal'].dims == ('animal',)


class TestArithmetic:
  def test_same_dims(self):
    a, b = make(seed=1), make(seed=2)
    c = a + b
    np.testing.assert_allclose(c.values, a.values + b.values)

  def test_broadcast_by_name(self):
    a = DimArray(np.arange(6.0).reshape(2, 3), ('x', 'y'))
    b = DimArray(np.arange(3.0), ('y',))
    c = a * b
    assert c.dims == ('x', 'y')
    np.testing.assert_allclose(c.values, a.values * b.values[None, :])
    # Reversed operand order: dims ordered by first appearance.
    d = b * a
    assert d.dims == ('y', 'x')
    np.testing.assert_allclose(d.values, (a.values * b.values[None, :]).T)

  def test_shared_dim_size_mismatch_raises_named_error(self):
    # Both extents >1 on a shared dim can never broadcast: the error must
    # name the dim (not surface as a positional-shape TypeError from jax).
    a = DimArray(np.zeros((2, 3)), ('x', 'y'))
    b = DimArray(np.zeros((2, 4)), ('x', 'y'))
    with pytest.raises(ValueError, match="'y'.*mismatched sizes 3 and 4"):
      a + b
    with pytest.raises(ValueError, match='mismatched sizes'):
      a.where(b > 0)

  def test_shared_dim_size_one_broadcasts(self):
    # Documented divergence from xarray: a size-1 extent on a shared dim
    # broadcasts (xarray refuses); relied on by keepdims-style reductions.
    a = DimArray(np.arange(6.0).reshape(2, 3), ('x', 'y'))
    b = DimArray(np.arange(3.0).reshape(1, 3), ('x', 'y'))
    c = a + b
    assert c.shape == (2, 3)
    np.testing.assert_allclose(c.values, a.values + b.values)

  def test_disjoint_dims_outer(self):
    a = DimArray(np.arange(2.0), ('x',))
    b = DimArray(np.arange(3.0), ('y',))
    c = a + b
    assert c.dims == ('x', 'y')
    assert c.shape == (2, 3)

  def test_transposed_operand(self):
    a = make()
    b = a.transpose('y', 'x')
    c = a - b
    np.testing.assert_allclose(c.values, np.zeros((2, 3)), atol=1e-12)

  def test_scalar_ops(self):
    a = make()
    np.testing.assert_allclose((a * 2 + 1).values, a.values * 2 + 1)
    np.testing.assert_allclose((1 - a).values, 1 - a.values)
    np.testing.assert_allclose((2.0 / a).values, 2.0 / a.values)

  def test_comparison_and_logical(self):
    a = make()
    m = (a > 0) & (a < 1)
    np.testing.assert_array_equal(m.values, (a.values > 0) & (a.values < 1))

  def test_coords_propagate(self):
    a = make()
    b = a + 1
    assert 'x' in b.coords and 'y' in b.coords


class TestReductions:
  def test_mean_over_dim(self):
    a = make()
    m = a.mean('y')
    assert m.dims == ('x',)
    np.testing.assert_allclose(m.values, a.values.mean(axis=1))
    assert 'y' not in m.coords

  def test_sum_all(self):
    a = make()
    np.testing.assert_allclose(a.sum().item(), a.values.sum())

  def test_skipna(self):
    data = np.array([[1.0, np.nan], [3.0, 4.0]])
    a = DimArray(data, ('x', 'y'))
    np.testing.assert_allclose(a.mean('y', skipna=True).values, [1.0, 3.5])
    assert np.isnan(a.mean('y').values[0])

  def test_std_ddof(self):
    a = make((5,), ('x',))
    np.testing.assert_allclose(
        a.std('x', ddof=1).item(), a.values.std(ddof=1))

  def test_empty_dim_list_is_noop(self):
    """x.sum(()) / x.sum([]) keep the array unchanged (xarray semantics);
    `axis=() or None` would instead reduce everything and then fail to
    match the retained dims."""
    a = make()
    for out in (a.sum(()), a.sum([]), a.mean(())):
      assert out.dims == a.dims
      np.testing.assert_allclose(np.asarray(out.values), a.values)


class TestWhereMask:
  def test_where_scalar_other(self):
    a = make()
    w = a.where(a > 0)
    expected = np.where(a.values > 0, a.values, np.nan)
    np.testing.assert_allclose(w.values, expected)

  def test_where_fill(self):
    a = make()
    w = a.where(a > 0, 0.0)
    np.testing.assert_allclose(w.values, np.where(a.values > 0, a.values, 0))

  def test_where_broadcasts(self):
    a = make()
    cond = DimArray(np.array([True, False]), ('x',))
    w = a.where(cond, 0.0)
    assert w.dims == ('x', 'y')
    assert (w.values[1] == 0).all()

  def test_isnull(self):
    a = DimArray(np.array([1.0, np.nan]), ('x',))
    np.testing.assert_array_equal(a.isnull().values, [False, True])


class TestIndexing:
  def test_isel_int(self):
    a = make()
    b = a.isel(x=1)
    assert b.dims == ('y',)
    np.testing.assert_allclose(b.values, a.values[1])
    assert a.coords['x'].dims == ('x',)
    assert b.coords['x'].dims == ()

  def test_isel_slice_array(self):
    a = make((4, 3), ('x', 'y'))
    np.testing.assert_allclose(a.isel(x=slice(1, 3)).values, a.values[1:3])
    np.testing.assert_allclose(
        a.isel(x=np.array([0, 2])).values, a.values[[0, 2]])

  def test_sel_exact(self):
    a = make()
    b = a.sel(y=[0.0, 2.0])
    np.testing.assert_allclose(b.values, a.values[:, [0, 2]])
    with pytest.raises(KeyError):
      a.sel(y=5.0)

  def test_sel_nearest(self):
    a = make()
    b = a.sel(y=[0.1, 1.9], method='nearest')
    np.testing.assert_allclose(b.values, a.values[:, [0, 2]])

  def test_sel_datetime(self):
    times = np.arange('2020-01-01', '2020-01-05', dtype='datetime64[D]')
    a = DimArray(np.arange(4.0), ('time',), {'time': times})
    b = a.sel(time=np.datetime64('2020-01-02'))
    assert b.item() == 1.0

  def test_sortby(self):
    a = DimArray(
        np.array([3.0, 1.0, 2.0]), ('x',), {'x': np.array([2, 0, 1])})
    b = a.sortby('x')
    np.testing.assert_allclose(b.values, [1.0, 2.0, 3.0])


class TestShaping:
  def test_expand_dims(self):
    a = make()
    b = a.expand_dims('z')
    assert b.dims == ('z', 'x', 'y')
    assert b.shape == (1, 2, 3)

  def test_concat_existing_dim(self):
    a, b = make(seed=1), make(seed=2)
    c = darray.concat([a, b], 'x')
    assert c.shape == (4, 3)
    np.testing.assert_allclose(c.values, np.concatenate([a.values, b.values]))
    assert len(c.coord_values('x')) == 4

  def test_concat_new_dim(self):
    a, b = make(seed=1), make(seed=2)
    c = darray.concat([a, b], 'member')
    assert c.dims == ('member', 'x', 'y')

  def test_broadcast_like(self):
    a = DimArray(np.arange(3.0), ('y',))
    b = make()
    c = a.broadcast_like(b)
    assert c.sizes == {'x': 2, 'y': 3}


class TestDot:
  def test_weighted_reduce(self):
    a = make((2, 3), ('x', 'y'), seed=1)
    w = DimArray(np.array([1.0, 2.0, 3.0]), ('y',))
    out = darray.dot(a, w, dim=('y',))
    np.testing.assert_allclose(out.values, (a.values * w.values).sum(axis=1))

  def test_multi_operand_binning(self):
    stat = make((2, 3), ('x', 'y'), seed=1)
    w = DimArray(np.array([0.5, 1.5, 1.0]), ('y',))
    mask = DimArray(np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]),
                    ('y', 'bin'))
    out = darray.dot(stat, w, mask, dim=('y',))
    assert set(out.dims) == {'x', 'bin'}
    expected = np.einsum('xy,y,yb->xb', stat.values, w.values, mask.values)
    np.testing.assert_allclose(out.transpose('x', 'bin').values, expected)

  def test_reduce_all_dims(self):
    a = make()
    out = darray.dot(a, dim=('x', 'y'))
    np.testing.assert_allclose(out.item(), a.values.sum())


class TestPytree:
  def test_jit_through(self):
    a = make()

    @jax.jit
    def f(da):
      return (da * 2).mean('y')

    out = f(a)
    assert isinstance(out, DimArray)
    assert out.dims == ('x',)
    np.testing.assert_allclose(out.values, (a.values * 2).mean(axis=1))
    # Host coords preserved through jit as static aux data.
    np.testing.assert_array_equal(out.coord_values('x'), [0.0, 1.0])

  def test_device_coord_is_leaf(self):
    a = make()
    a = a.assign_coords(mask=Coord(('x', 'y'), jnp.ones((2, 3), bool)))
    leaves = jax.tree_util.tree_leaves(a)
    assert len(leaves) == 2  # data + mask

    @jax.jit
    def f(da):
      return da.where(DimArray(da.coords['mask'].values, da.dims), 0.0).sum()

    assert f(a).item() == pytest.approx(a.values.sum())

  def test_jit_cache_on_same_coords(self):
    a = make()
    calls = []

    @jax.jit
    def f(da):
      calls.append(1)
      return da.sum()

    f(a)
    f(make(seed=3))  # same coords/shape -> no retrace
    assert len(calls) == 1

  def test_datetime_coord_static(self):
    times = np.arange('2020-01-01', '2020-01-03', dtype='datetime64[D]')
    a = DimArray(np.arange(2.0), ('time',), {'time': times})

    @jax.jit
    def f(da):
      return da + 1

    out = f(a)
    assert out.coord_values('time').dtype.kind == 'M'


class TestApplyUfunc:
  def test_core_dim_reduction(self):
    a = make((2, 3, 4), ('x', 'y', 'e'), seed=1)
    out = darray.apply_ufunc(
        lambda v: jnp.sort(v, axis=-1)[..., -1],
        a, input_core_dims=[('e',)], output_core_dims=[()])
    assert out.dims == ('x', 'y')
    np.testing.assert_allclose(out.values, a.values.max(axis=-1))


def test_dot_all_bool_counts_instead_of_or():
  a = DimArray(np.array([True, False, True]), ('x',))
  b = DimArray(np.array([True, True, False]), ('x',))
  out = darray.dot(a, b, dim='x')
  # ANDed indicator count, not logical OR: one overlapping True.
  assert float(np.asarray(out.values)) == 1.0


class TestConcatNonDimCoords:
  """Regression: differing non-dim coords gain the concat dim (xr.concat)."""

  def _part(self, mask_val: bool, x=3):
    import numpy as np
    from weatherbenchx_tpu.darray import Coord, DimArray
    mask = np.full((x,), mask_val)
    return DimArray(np.arange(x, dtype=np.float32), ('x',),
                    {'x': np.arange(x), 'mask': Coord(('x',), mask)})

  def test_identical_coords_stay_unstacked(self):
    import numpy as np
    from weatherbenchx_tpu import darray
    a, b = self._part(True), self._part(True)
    out = darray.concat([a, b], 'new')
    assert out.coords['mask'].dims == ('x',)
    assert out.coords['x'].dims == ('x',)

  def test_differing_coords_stack_along_concat_dim(self):
    import numpy as np
    from weatherbenchx_tpu import darray
    a, b = self._part(True), self._part(False)
    out = darray.concat([a, b], 'new')
    mc = out.coords['mask']
    assert mc.dims == ('new', 'x')
    np.testing.assert_array_equal(
        np.asarray(mc.values),
        np.stack([np.full(3, True), np.full(3, False)]))

  def test_differing_coords_with_multi_size_parts_repeat(self):
    import numpy as np
    from weatherbenchx_tpu import darray
    from weatherbenchx_tpu.darray import Coord, DimArray

    def part(n, mask_val):
      mask = np.full((3,), mask_val)
      return DimArray(np.zeros((n, 3), np.float32), ('t', 'x'),
                      {'t': np.arange(n), 'x': np.arange(3),
                       'mask': Coord(('x',), mask)})

    out = darray.concat([part(2, True), part(3, False)], 't')
    mc = out.coords['mask']
    assert mc.dims == ('t', 'x')
    vals = np.asarray(mc.values)
    assert vals.shape == (5, 3)
    assert vals[:2].all() and not vals[2:].any()

  def test_coord_missing_in_one_part_keeps_first(self):
    import numpy as np
    from weatherbenchx_tpu import darray
    from weatherbenchx_tpu.darray import DimArray
    a = self._part(True)
    b = DimArray(np.arange(3, dtype=np.float32), ('x',),
                 {'x': np.arange(3)})
    out = darray.concat([a, b], 'new')
    assert out.coords['mask'].dims == ('x',)

  def test_device_valued_distinct_coords_stack(self):
    import jax.numpy as jnp
    import numpy as np
    from weatherbenchx_tpu import darray
    from weatherbenchx_tpu.darray import Coord, DimArray

    def part(v):
      return DimArray(jnp.zeros((3,)), ('x',),
                      {'x': np.arange(3),
                       'mask': Coord(('x',), jnp.full((3,), v, bool))})

    out = darray.concat([part(True), part(False)], 'new')
    assert out.coords['mask'].dims == ('new', 'x')


class TestMapStructureValidation:
  def test_mismatched_dict_keys_raise(self):
    from weatherbenchx_tpu import tree
    with pytest.raises(ValueError, match='identical keys'):
      tree.map_structure(lambda a, b: a + b, {'x': 1}, {'x': 1, 'y': 2})
    with pytest.raises(ValueError, match='identical keys'):
      tree.map_structure(lambda a, b: a + b, {'x': 1, 'y': 2}, {'x': 1})

  def test_mismatched_sequence_lengths_raise(self):
    from weatherbenchx_tpu import tree
    with pytest.raises(ValueError, match='equal length'):
      tree.map_structure(lambda a, b: a + b, [1, 2, 3], [1, 2])

  def test_matching_structures_ok(self):
    from weatherbenchx_tpu import tree
    assert tree.map_structure(
        lambda a, b: a + b, {'x': (1, 2)}, {'x': (10, 20)}) == {'x': (11, 22)}
