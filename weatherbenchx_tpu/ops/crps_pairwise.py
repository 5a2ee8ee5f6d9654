"""Pallas TPU kernel for the pairwise CRPS spread term Σ_{i≠j}|x_i − x_j|.

The reference offers two spread estimators (``probabilistic.py:148-247``):
the O(M²) pairwise form and the O(M log M) Zamo & Naveau sort/PWM form, and
uses the sort form in production because on CPU the pairwise form is
hopeless. On TPU, XLA's ``lax.sort`` lowering is hopeless instead (43
ms/step at M=50 over 4×721×1440 gridpoints on a v5e chip) — but BOTH
estimator forms work well as Pallas kernels on a VMEM-resident member
block, and the kernel picks per M (``_spread_form``): an in-kernel
statically-unrolled bitonic network + PWM weighted sum at M≥20 (8.4
ms/step at M=50), pair enumeration below (where the O(M²) pair count is
still small). Earlier iterations of the pairs body: pltpu.roll
half-pairwise 14 ms → ungrouped slice enumeration 8.2 ms → group-tiled
6.9–9.2 ms (run-to-run tunnel spread).

Kernel shape: the ensemble axis is the leading (outermost) block axis; the
trailing two data axes are tiled into (sublane, lane) VMEM blocks and any
middle axes become unit-block grid dimensions. The kernel is rank-native on
purpose — collapsing trailing axes with ``reshape`` forces a physical
retiling of TPU tiled layouts (measured +35 ms/step on the 4D production
array), so no caller-side flattening is allowed anywhere on this path.

The inner loop enumerates each unordered pair {i, j} exactly once, with
the member axis group-tiled (5-member groups at production M) so loaded
rows are re-used across a whole group of partners before eviction —
within a group as slice pairs |xa[k:] − xa[:-k]|, across groups as
row-vs-group broadcasts — then doubles the sum for Σ_{i≠j}. Leading-axis
slices are address offsets on the untiled member axis, so every pass is
subtract/abs/accumulate with no data movement (the roll variant paid a
real VMEM permute per shift — see git history). NaNs propagate exactly
like the reference's skipna=False semantics (any NaN member poisons its
own gridpoint, and only that gridpoint).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Per-block element budget for the (M, …, sublane, lane) VMEM working set.
# Empirical: at M=50 a (50, 4096)-element block compiles (~10 MB scoped
# stack) and (50, 8192) exceeds the 16 MB VMEM stack limit, so cap the
# block at ~205k elements and shrink lane/sublane extents to fit.
_BLOCK_ELEMS = 204_800


def _tpu_and_fits(total_members: int, dtype) -> bool:
  dt = jnp.dtype(dtype)
  if dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
    return False
  if total_members * 8 * 128 > _BLOCK_ELEMS:  # min one (8, 128) f32 tile
    return False
  try:
    return jax.default_backend() == 'tpu'
  except RuntimeError:
    return False


def supported(m: int, dtype) -> bool:
  """Whether the spread kernel applies: TPU, ≥2 members, fits VMEM."""
  return m >= 2 and _tpu_and_fits(m, dtype)


def cross_supported(mx: int, my: int, dtype) -> bool:
  """Whether the two-ensemble cross kernel applies."""
  return mx >= 1 and my >= 1 and _tpu_and_fits(mx + my, dtype)


def _spread_form(m: int) -> str:
  """Which spread kernel body to trace: 'pairs' or 'sort'.

  The pair-enumeration form does O(m²) tile-ops with high ILP; the
  bitonic/PWM sort form does O(m log² m) tile-ops but as a deep
  dependency chain of min/max rounds. Measured on v5e at the production
  0.25° block (tools/bench_spread_forms.py, two independent runs):
  sort wins at m=50 (8.4 vs 9.2 ms/step), m=24 (5.5 vs 5.8) and m=20
  (4.8 vs 5.1); ties at m=32 (network pads 50→64 but 24→32, so the
  padded network size, not m itself, sets the sort cost); pairs wins
  narrowly at m≤16 (4.6 vs 4.7 at 16, 3.6 vs 3.7 at 8) where the O(m²)
  pair count is still small. Crossover set at m=20.
  ``WBX_SPREAD_FORM`` overrides for A/B runs (read at trace time —
  already-jitted callers keep their traced form).
  """
  import os
  form = os.environ.get('WBX_SPREAD_FORM', '')
  if form in ('pairs', 'sort'):
    return form
  return 'sort' if m >= 20 else 'pairs'


def _spread_group(m: int) -> int:
  # Group-tile the member axis at large M: pairing a resident 5-member
  # group against each later group re-uses loaded rows ~g times, cutting
  # VMEM re-reads (measured 8.24 → 6.89 ms at M=50; flat for g in 5–10;
  # worse again at g=25 when the group no longer stays resident). Small M
  # runs as one group — identical to the plain sliced enumeration.
  return 5 if m >= 32 else m


def _spread_value_pairs(x, m: int):
  # Each unordered pair {i, j} is enumerated exactly once — within a
  # group as (i, i+k) slice pairs |xa[k:] − xa[:-k]|, across groups as
  # row-vs-group broadcasts — then doubled for Σ_{i≠j}. Leading-axis
  # slices are address offsets (the member axis is untiled), so this is
  # pure subtract/abs/accumulate VPU work: an earlier pltpu.roll-based
  # variant paid a real data movement per shift (14.1 ms at M=50 on the
  # production block vs 6.9 ms for this form).
  g = _spread_group(m)
  acc = jnp.zeros(x.shape[1:], x.dtype)
  for a in range(0, m, g):
    ga = min(g, m - a)
    xa = x[a:a + ga]
    for k in range(1, ga):
      acc = acc + jnp.sum(jnp.abs(xa[k:] - xa[:-k]), axis=0)
    for b in range(a + g, m, g):
      xb = x[b:b + min(g, m - b)]
      for i in range(ga):
        acc = acc + jnp.sum(jnp.abs(xa[i:i + 1] - xb), axis=0)
  return acc * 2


def _spread_kernel(x_ref, out_ref, *, m: int):
  out_ref[:] = _spread_value_pairs(x_ref[:], m)


_PAD = object()  # symbolic +inf row: never materialized, folds in Python


def _ce_min(a, b):
  # min(x, +inf) = x — also correct for NaN x (IEEE min propagates NaN,
  # and x IS the NaN), so the symbolic fold never loses a NaN.
  if a is _PAD:
    return b
  if b is _PAD:
    return a
  return jnp.minimum(a, b)


def _ce_max(a, b):
  # max(NaN, +inf) is NaN but we return the pad; safe because the same
  # compare-exchange keeps the NaN row on the min side (see _ce_min), so
  # at least one NaN copy always survives among the real rows. That alone
  # is not sufficient for ODD m, where the median rank's PWM coefficient
  # (2r-m-1) is zero: the survival argument is that a lone NaN DUPLICATES
  # at its first real-vs-real compare-exchange (jnp.minimum and
  # jnp.maximum both return NaN), so from then on ≥2 copies exist and at
  # least one lands at a non-median rank with a nonzero coefficient —
  # verified for every NaN position at m=21 in
  # tests/test_crps_pairwise.py::TestSpreadFormParity::
  # test_sort_form_odd_m_nan_every_position.
  if a is _PAD or b is _PAD:
    return _PAD
  return jnp.maximum(a, b)


def _sort_network(p: int, kind: str) -> list:
  """Compare-exchange list [(lo_idx, hi_idx, ascending)] for p = 2^k wires.

  ``oem``: Batcher odd-even mergesort — all-ascending comparators,
  C(2^k) = (k²−k+4)·2^{k−2} − 1 CEs (543 at p=64 vs bitonic's 672;
  after symbolic +inf-pad folding at m=50: 806 min/max ops vs 984, 18%
  fewer — verified exhaustively via the 0-1 principle at p≤16 and on
  100k threshold patterns at p=32/64/128). ``bitonic``: the classic
  direction-flipping network, kept for WBX_SPREAD_SORT_NET A/B runs.
  """
  ces = []
  if kind == 'oem':
    length = 1
    while length < p:
      k = length
      while k >= 1:
        for j in range(k % length, p - k, 2 * k):
          for i in range(0, min(k, p - j - k)):
            if (i + j) // (length * 2) == (i + j + k) // (length * 2):
              ces.append((i + j, i + j + k, True))
        k //= 2
      length *= 2
    return ces
  k = 2
  while k <= p:
    j = k // 2
    while j >= 1:
      for i in range(p):
        l = i ^ j
        if l > i:
          ces.append((i, l, (i & k) == 0))
      j //= 2
    k *= 2
  return ces


def _sort_net_kind() -> str:
  import os
  kind = os.environ.get('WBX_SPREAD_SORT_NET', '')
  return kind if kind in ('oem', 'bitonic') else 'oem'


def _spread_value_sort(x, m: int):
  # Sort-form spread: a statically-unrolled sorting network over the
  # member axis (rows are (sublane, lane) tiles; each compare-exchange is
  # an elementwise min/max pair on the VPU), then the Zamo & Naveau
  # order-statistic identity Σ_{i≠j}|x_i − x_j| = 2 Σ_k (2k − m − 1) x_(k).
  # Default network is Batcher odd-even mergesort (_sort_network): ~0.8k
  # tile-ops at m=50 vs ~1.4k bitonic and ~3.7k pair enumeration.
  # Padding to the next power of two is symbolic (+inf rows fold away in
  # Python), so no extra VMEM traffic is paid for the pad.
  rows = [x[i] for i in range(m)]
  p = 1
  while p < m:
    p *= 2
  rows = rows + [_PAD] * (p - m)
  for i, l, asc in _sort_network(p, _sort_net_kind()):
    a, b = rows[i], rows[l]
    lo, hi = _ce_min(a, b), _ce_max(a, b)
    rows[i], rows[l] = (lo, hi) if asc else (hi, lo)
  acc = None
  for idx in range(m):
    coeff = 2 * (idx + 1) - m - 1
    if coeff == 0:
      continue
    assert rows[idx] is not _PAD  # pads sort above all real rows
    term = rows[idx] * jnp.asarray(coeff, x.dtype)
    acc = term if acc is None else acc + term
  return acc * 2


def _spread_kernel_sort(x_ref, out_ref, *, m: int):
  out_ref[:] = _spread_value_sort(x_ref[:], m)


def _spread_value(x, m: int):
  return (_spread_value_sort if _spread_form(m) == 'sort'
          else _spread_value_pairs)(x, m)


def _fused_kernel(x_ref, y_ref, spread_ref, skill_ref, mean_ref,
                  sqdev_ref, *, m: int):
  # One pass over the VMEM-resident ensemble block produces all four
  # ensemble statistics the probabilistic benchmark family needs — the
  # separate skill/mean/variance XLA pass otherwise re-reads the whole
  # ensemble from HBM (~830 MB at the production 50×0.25° shape).
  # The mean/sq-dev pair is deliberately TWO-pass over the block
  # (mean first, then squared deviations): the one-pass moment form
  # Σx² − (Σx)²/m is catastrophically inaccurate in f32 when |mean| ≫ std
  # (e.g. temperatures: 288² vs variance ~9).
  x = x_ref[:]
  y = y_ref[:]
  spread_ref[:] = _spread_value(x, m)
  skill_ref[:] = jnp.sum(jnp.abs(x - y), axis=0)
  mean = jnp.sum(x, axis=0) / m
  mean_ref[:] = mean
  sqdev_ref[:] = jnp.sum((x - mean) ** 2, axis=0)


def _block_shape(m: int, r: int, c: int) -> tuple[int, int]:
  """(sublane, lane) block extents keeping m·br·bc within the VMEM budget.

  Measured on v5e (0.25° production shape): at M=50 the grouped kernel
  is fastest on an (8, 256) tile (6.89 ms; (8,128) 7.3, (8,512) 6.88 but
  more VMEM), while at M≤16 per-block compute is too thin and the grid
  overhead makes the larger budget-derived blocks ~25% faster. Split on
  compute density (pairs per element).
  """
  if m >= 32:
    bc = 256 if m * 8 * 256 <= _BLOCK_ELEMS else 128
    return max(min(8, r), 1), min(-(-c // 128) * 128, bc)
  bc = min(-(-c // 128) * 128, 512)
  while bc > 128 and m * 8 * bc > _BLOCK_ELEMS:
    bc //= 2
  br = max(_BLOCK_ELEMS // (m * bc), 1)
  if br >= 8:
    br = br // 8 * 8
  return max(min(br, r), 1), bc


def _pairwise_spread_sum_impl(x: jnp.ndarray, interpret: bool
                              ) -> jnp.ndarray:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  m, rest = x.shape[0], x.shape[1:]
  kernel = (_spread_kernel_sort if _spread_form(m) == 'sort'
            else _spread_kernel)
  if not rest:
    # Scalar ensembles: the jnp pairwise form is already trivial.
    return jnp.abs(x[:, None] - x[None, :]).sum((0, 1))
  if len(rest) == 1:
    (c,) = rest
    bc = min(max(_BLOCK_ELEMS // m // 128 * 128, 128), 4096)
    return pl.pallas_call(
        functools.partial(kernel, m=m),
        out_shape=jax.ShapeDtypeStruct((c,), x.dtype),
        grid=(-(-c // bc),),
        in_specs=[pl.BlockSpec((m, bc), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bc,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)

  mids, (r, c) = rest[:-2], rest[-2:]
  br, bc = _block_shape(m, r, c)
  n_mid = len(mids)

  def in_index(*idx):
    return (0,) + idx[:n_mid] + (idx[-2], idx[-1])

  def out_index(*idx):
    return idx[:n_mid] + (idx[-2], idx[-1])

  return pl.pallas_call(
      functools.partial(kernel, m=m),
      out_shape=jax.ShapeDtypeStruct(rest, x.dtype),
      grid=mids + (-(-r // br), -(-c // bc)),
      in_specs=[pl.BlockSpec((m,) + (1,) * n_mid + (br, bc), in_index,
                             memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec((1,) * n_mid + (br, bc), out_index,
                             memory_space=pltpu.VMEM),
      interpret=interpret,
  )(x)


def _fused_stats_impl(x: jnp.ndarray, y: jnp.ndarray,
                      interpret: bool) -> tuple:
  """(spread_sum, skill_sum, mean, sq_dev_sum) in one pass over x.

  x: (M, *rest) ensemble, y: (*rest) deterministic target. Requires at
  least two trailing data axes (the production layout); callers fall
  back to the separate paths otherwise.
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  m, rest = x.shape[0], x.shape[1:]
  if y.shape != rest:
    raise ValueError(f'target shape {y.shape} != ensemble rest {rest}')
  mids, (r, c) = rest[:-2], rest[-2:]
  br, bc = _block_shape(m, r, c)
  n_mid = len(mids)

  def in_index(*idx):
    return (0,) + idx[:n_mid] + (idx[-2], idx[-1])

  def out_index(*idx):
    return idx[:n_mid] + (idx[-2], idx[-1])

  block = (1,) * n_mid + (br, bc)
  out_spec = pl.BlockSpec(block, out_index, memory_space=pltpu.VMEM)
  out_shape = jax.ShapeDtypeStruct(rest, x.dtype)
  return pl.pallas_call(
      functools.partial(_fused_kernel, m=m),
      out_shape=(out_shape,) * 4,
      grid=mids + (-(-r // br), -(-c // bc)),
      in_specs=[pl.BlockSpec((m,) + block, in_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(block, out_index, memory_space=pltpu.VMEM)],
      out_specs=(out_spec,) * 4,
      interpret=interpret,
  )(x, y)


def _make_fused_partitioned(interpret: bool, ndim: int):
  """GSPMD rule for the fused kernel: like the spread kernel — shard any
  data dim, replicate the member axis; all four outputs inherit the data
  sharding."""
  from jax.experimental.custom_partitioning import custom_partitioning
  from jax.sharding import NamedSharding, PartitionSpec

  @custom_partitioning
  def fn(x, y):
    return _fused_stats_impl(x, y, interpret)

  def infer_sharding(mesh, arg_infos, result_infos):
    del result_infos
    spec = _norm_spec(arg_infos[0].sharding.spec, ndim)
    out = NamedSharding(mesh, PartitionSpec(*spec[1:]))
    return (out,) * 4

  def partition(mesh, arg_infos, result_infos):
    del result_infos
    spec = _norm_spec(arg_infos[0].sharding.spec, ndim)
    x_sh = NamedSharding(mesh, PartitionSpec(None, *spec[1:]))
    y_sh = NamedSharding(mesh, PartitionSpec(*spec[1:]))
    out_sh = NamedSharding(mesh, PartitionSpec(*spec[1:]))
    def lower(x, y):
      return _fused_stats_impl(x, y, interpret)
    return mesh, lower, (out_sh,) * 4, (x_sh, y_sh)

  data_axes = ' '.join(f'd{i}' for i in range(ndim - 1))
  outs = ', '.join([data_axes] * 4)
  fn.def_partition(infer_sharding_from_operands=infer_sharding,
                   partition=partition,
                   sharding_rule=f'm {data_axes}, {data_axes} -> {outs}')
  return fn


@functools.lru_cache(maxsize=None)
def _fused_partitioned(interpret: bool, ndim: int):
  return jax.jit(_make_fused_partitioned(interpret, ndim))


def fused_supported(m: int, n_data_dims: int, dtype) -> bool:
  """The fused ensemble-stats kernel applies (see fused_ensemble_stats)."""
  return n_data_dims >= 2 and supported(m, dtype)


def fused_ensemble_stats(x: jnp.ndarray, y: jnp.ndarray,
                         interpret: bool = False) -> tuple:
  """One ensemble pass → (spread_sum, skill_sum, mean, sq_dev_sum).

  spread_sum = Σ_{i≠j}|x_i − x_j|; skill_sum = Σ_i |x_i − y|;
  mean = (Σ_i x_i)/M; sq_dev_sum = Σ_i (x_i − mean)² — the inputs for
  CRPS skill/spread, the unbiased ensemble-mean MSE, and the ddof
  variance, computed from one VMEM-resident block instead of two
  separate HBM passes over the (M, …) ensemble.
  """
  if x.ndim != y.ndim + 1:
    raise ValueError(f'rank mismatch: {x.shape} vs {y.shape}')
  if x.ndim < 3:
    raise ValueError('fused kernel needs >= 2 trailing data axes')
  return _fused_partitioned(bool(interpret), x.ndim)(x, y)


def _cross_kernel(x_ref, y_ref, out_ref, *, my: int):
  # Same group-tiling as the spread kernel (row-vs-group broadcasts per
  # group pair): 5.26 → 4.84 ms at 25×25 members on the production block.
  x = x_ref[:]
  mx = x.shape[0]
  g = _spread_group(mx + my)
  acc = jnp.zeros(x.shape[1:], x.dtype)
  for a in range(0, mx, g):
    xa = x[a:a + min(g, mx - a)]
    for b in range(0, my, g):
      yb = y_ref[b:b + min(g, my - b)]
      for i in range(xa.shape[0]):
        acc = acc + jnp.sum(jnp.abs(xa[i:i + 1] - yb), axis=0)
  out_ref[:] = acc


def _pairwise_cross_sum_impl(x: jnp.ndarray, y: jnp.ndarray,
                             interpret: bool) -> jnp.ndarray:
  """Σ_{i,j} |x[i] − y[j]| over both leading axes, elementwise over rest."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  mx, my, rest = x.shape[0], y.shape[0], x.shape[1:]
  if y.shape[1:] != rest:
    raise ValueError(f'mismatched trailing shapes: {x.shape} vs {y.shape}')
  if len(rest) < 2:
    # Small/ragged shapes: the broadcast form is fine here.
    return jnp.abs(x[:, None] - y[None, :]).sum((0, 1))

  mids, (r, c) = rest[:-2], rest[-2:]
  br, bc = _block_shape(mx + my, r, c)
  n_mid = len(mids)

  def in_index(*idx):
    return (0,) + idx[:n_mid] + (idx[-2], idx[-1])

  def out_index(*idx):
    return idx[:n_mid] + (idx[-2], idx[-1])

  block = (1,) * n_mid + (br, bc)
  return pl.pallas_call(
      functools.partial(_cross_kernel, my=my),
      out_shape=jax.ShapeDtypeStruct(rest, x.dtype),
      grid=mids + (-(-r // br), -(-c // bc)),
      in_specs=[pl.BlockSpec((mx,) + block, in_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((my,) + block, in_index,
                             memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(block, out_index, memory_space=pltpu.VMEM),
      interpret=interpret,
  )(x, y)


def _norm_spec(spec, ndim):
  parts = tuple(spec) if spec is not None else ()
  return parts + (None,) * (ndim - len(parts))


def _make_partitioned(interpret: bool, ndim: int):
  """GSPMD rule: shard freely over data dims, replicate the ensemble axis.

  The kernel is embarrassingly parallel over every non-ensemble dim but
  needs all members of a gridpoint together, so under a sharded jit the
  partitioner runs the kernel per-shard with the member axis gathered —
  the multi-chip layout the evaluator uses (``parallel/evaluator.py``)
  already keeps members together unless the mesh maps the ensemble dim,
  in which case GSPMD inserts the all-gather this rule demands.
  """
  from jax.experimental.custom_partitioning import custom_partitioning
  from jax.sharding import NamedSharding, PartitionSpec

  @custom_partitioning
  def fn(x):
    return _pairwise_spread_sum_impl(x, interpret)

  def infer_sharding(mesh, arg_infos, result_infos):
    del result_infos
    spec = _norm_spec(arg_infos[0].sharding.spec, ndim)
    return NamedSharding(mesh, PartitionSpec(*spec[1:]))

  def partition(mesh, arg_infos, result_infos):
    spec = _norm_spec(arg_infos[0].sharding.spec, ndim)
    arg_sh = NamedSharding(mesh, PartitionSpec(None, *spec[1:]))
    out_sh = NamedSharding(mesh, PartitionSpec(*spec[1:]))
    def lower(x):
      return _pairwise_spread_sum_impl(x, interpret)
    return mesh, lower, out_sh, (arg_sh,)

  # Shardy rule, einsum-style: the member axis 'm' exists only on the
  # input (it is reduced); every data dim propagates through unchanged.
  data_axes = ' '.join(f'd{i}' for i in range(ndim - 1))
  fn.def_partition(infer_sharding_from_operands=infer_sharding,
                   partition=partition,
                   sharding_rule=f'm {data_axes} -> {data_axes}')
  return fn


@functools.lru_cache(maxsize=None)
def _partitioned(interpret: bool, ndim: int):
  if ndim == 1:
    # Ensemble-only input: no data dims to shard, and the einsum-style
    # sharding rule would degenerate to an empty RHS — skip the custom
    # partitioner (the scalar jnp fallback inside the impl handles it).
    return jax.jit(lambda x: _pairwise_spread_sum_impl(x, interpret))
  return jax.jit(_make_partitioned(interpret, ndim))


def _make_cross_partitioned(interpret: bool, ndim: int):
  """Same GSPMD rule as the spread kernel, for the two-ensemble cross sum."""
  from jax.experimental.custom_partitioning import custom_partitioning
  from jax.sharding import NamedSharding, PartitionSpec

  @custom_partitioning
  def fn(x, y):
    return _pairwise_cross_sum_impl(x, y, interpret)

  def infer_sharding(mesh, arg_infos, result_infos):
    del result_infos
    spec = _norm_spec(arg_infos[0].sharding.spec, ndim)
    return NamedSharding(mesh, PartitionSpec(*spec[1:]))

  def partition(mesh, arg_infos, result_infos):
    del result_infos
    spec = _norm_spec(arg_infos[0].sharding.spec, ndim)
    arg_sh = NamedSharding(mesh, PartitionSpec(None, *spec[1:]))
    out_sh = NamedSharding(mesh, PartitionSpec(*spec[1:]))
    def lower(x, y):
      return _pairwise_cross_sum_impl(x, y, interpret)
    return mesh, lower, out_sh, (arg_sh, arg_sh)

  data_axes = ' '.join(f'd{i}' for i in range(ndim - 1))
  fn.def_partition(
      infer_sharding_from_operands=infer_sharding,
      partition=partition,
      sharding_rule=f'mx {data_axes}, my {data_axes} -> {data_axes}')
  return fn


@functools.lru_cache(maxsize=None)
def _cross_partitioned(interpret: bool, ndim: int):
  if ndim == 1:
    return jax.jit(lambda x, y: _pairwise_cross_sum_impl(x, y, interpret))
  return jax.jit(_make_cross_partitioned(interpret, ndim))


def pairwise_cross_sum(x: jnp.ndarray, y: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
  """Σ_{i,j} |x[i] − y[j]| over both leading axes (two-ensemble CRPS skill).

  x: (Mx, *rest), y: (My, *rest) with identical trailing shapes; returns a
  ``rest``-shaped sum without materializing the (Mx, My, *rest) broadcast.
  """
  if x.ndim != y.ndim:
    raise ValueError(f'rank mismatch: {x.shape} vs {y.shape}')
  return _cross_partitioned(bool(interpret), x.ndim)(x, y)


def pairwise_spread_sum(x: jnp.ndarray, interpret: bool = False
                        ) -> jnp.ndarray:
  """Σ_{i≠j} |x[i] − x[j]| over axis 0, elementwise over the rest.

  Args:
    x: (M, *rest) array, M = ensemble members leading, rest untouched (the
      kernel blocks the trailing two axes natively — no reshapes).
    interpret: run the Pallas interpreter (for CPU-side tests).

  Returns:
    ``rest``-shaped array of pairwise absolute-difference sums (both
    orderings counted, i.e. 2·Σ_{i<j}).
  """
  return _partitioned(bool(interpret), x.ndim)(x)


def spread_sum_along_axis(data: jnp.ndarray, axis: int,
                          interpret: bool = False) -> jnp.ndarray:
  """Pairwise |diff| sum over ``axis``; result drops that axis."""
  return pairwise_spread_sum(jnp.moveaxis(data, axis, 0),
                             interpret=interpret)
