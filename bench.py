"""Benchmark: per-chip evaluation throughput on the production workload shape.

Workload (mirrors the reference's production benchmark config,
``public_benchmark/run_benchmark_evaluation.py:96-101,341-354``): 0.25°
grid (1440×721), chunked evaluation with area weighting; deterministic
RMSE/MAE/Bias on a single-member forecast plus — once the probabilistic
suite is present — fair CRPS (sort-based) on an ensemble.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "gridpoint_stats_per_sec",
   "vs_baseline": N}
vs_baseline is the ratio against a single-process numpy implementation of
the same chunk evaluation (a stand-in for one Beam-on-CPU worker, the
reference's execution model).
"""

import json
import os
import sys
import time

import numpy as np


def _make_data(n_lead, nlat, nlon, ens=None, dtype=np.float32, seed=0):
  rng = np.random.default_rng(seed)
  lats = np.linspace(-90, 90, nlat)
  lons = np.linspace(0, 360, nlon, endpoint=False)
  shape = (1, n_lead, nlat, nlon)
  dims = ('init_time', 'lead_time', 'latitude', 'longitude')
  if ens:
    shape = (ens,) + shape
    dims = ('number',) + dims
  pred = rng.standard_normal(shape).astype(dtype)
  tgt = rng.standard_normal((1, n_lead, nlat, nlon)).astype(dtype)
  return pred, tgt, dims, lats, lons


def _numpy_baseline_time(pred, tgt, w, ens, iters=3):
  """Single-process numpy version of the same statistics (Beam-worker model)."""
  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    if ens:
      # CRPS skill + spread via the sort/rank form (reference
      # probabilistic.py:214-247) plus ensemble-mean MSE.
      m = pred.shape[0]
      skill = np.abs(pred - tgt[None]).mean(axis=0)
      sorted_pred = np.sort(pred, axis=0)
      ranks = np.arange(1, m + 1).reshape((m,) + (1,) * (pred.ndim - 1))
      spread = 2 * ((2 * ranks - m - 1) * sorted_pred).sum(axis=0) / (
          m * (m - 1))
      se = (pred.mean(axis=0) - tgt) ** 2
      # Aggregate the same THREE statistics the TPU path aggregates
      # (CRPSSkill, CRPSSpread, UnbiasedEnsembleMeanSquaredError) so the
      # per-stat normalization is identical on both sides of the ratio.
      stats = [skill, spread, se]
    else:
      err = pred - tgt
      stats = [err, np.abs(err), err ** 2]
    for s in stats:
      _ = (s * w).sum()
      _ = (np.ones_like(s) * w).sum()
    times.append(time.perf_counter() - t0)
  return min(times), len(stats)


def main():
  import jax
  # Persistent compile cache: repeat bench invocations skip remote compiles.
  try:
    jax.config.update('jax_compilation_cache_dir', '/tmp/wbx_xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
  except Exception:
    pass
  from weatherbenchx_tpu import aggregation, weighting
  from weatherbenchx_tpu.darray import DimArray
  from weatherbenchx_tpu.metrics import deterministic
  from weatherbenchx_tpu.parallel import evaluator as evaluator_lib

  try:
    from weatherbenchx_tpu.metrics import probabilistic
    has_prob = True
  except ImportError:
    has_prob = False

  if os.environ.get('WBX_BENCH_HEADLINE', '1') == '0':
    # A/B mode: skip the headline and run (a subset of) the full suite.
    import jax.numpy as jnp
    tiny = jax.jit(lambda v: v + 1)
    z = jax.device_put(jnp.zeros(()))
    float(tiny(z))
    lat_samples = []
    for i in range(5):
      lat0 = time.perf_counter()
      float(tiny(z + i))
      lat_samples.append(time.perf_counter() - lat0)
    latency = sorted(lat_samples)[len(lat_samples) // 2]
    print(json.dumps({'full_suite': full_suite(latency)}))
    return

  n_lead, nlat, nlon = 4, 721, 1440
  ens = 50 if has_prob else None
  pred_np, tgt_np, dims, lats, lons = _make_data(n_lead, nlat, nlon, ens)
  coords = {
      'init_time': np.array(['2020-01-01'], dtype='datetime64[ns]'),
      'lead_time': (np.arange(n_lead) * np.timedelta64(6, 'h')
                    ).astype('timedelta64[ns]'),
      'latitude': lats, 'longitude': lons,
  }
  if ens:
    coords['number'] = np.arange(ens)
  preds = {'z500': DimArray(pred_np, dims, coords)}
  tgts = {'z500': DimArray(tgt_np, dims[-4:],
                           {k: coords[k] for k in dims[-4:]})}

  if has_prob:
    metrics = {
        'crps': probabilistic.CRPSEnsemble(use_sort=True),
        'unbiased_mean_rmse': probabilistic.UnbiasedEnsembleMeanRMSE(),
    }
    n_stats = 3  # CRPSSkill, CRPSSpread, UnbiasedEnsembleMeanSquaredError
  else:
    metrics = {'rmse': deterministic.RMSE(), 'mae': deterministic.MAE(),
               'bias': deterministic.Bias()}
    n_stats = 3

  agg = aggregation.Aggregator(
      reduce_dims=['init_time', 'latitude', 'longitude'],
      weigh_by=[weighting.GridAreaWeighting()])
  ev = evaluator_lib.ChunkEvaluator(metrics=metrics, aggregator=agg)
  p = evaluator_lib.prepare_chunk(preds, is_predictions=True)
  t = evaluator_lib.prepare_chunk(tgts)
  # Stage inputs on device once: the production pipeline overlaps H2D with
  # compute, so steady-state throughput is the compiled step itself.
  p = jax.device_put(p)
  t = jax.device_put(t)

  import jax.numpy as jnp
  from jax import lax

  # Aggregation operands (weights/bins) and statistic resources
  # (climatologies) enter the program as ARGUMENTS, as in the pipeline —
  # baking them in as constants oversizes remote-compile payloads.
  bench_ops = ev.operands_for(p, t)
  bench_res = ev.resources()

  def scan_eval(p, t, ks, ops, res):
    """K evaluation steps in ONE dispatch (device-side loop).

    Each step perturbs the predictions by a tiny per-step offset — this
    defeats any (program, args) result caching in the runtime/tunnel and
    mirrors the per-chunk data change of the real pipeline, while adding
    only one fused elementwise op to the measured work.
    """
    def step(carry, k):
      p_k = {name: da.copy(data=da.data + 1e-6 * k) for name, da in p.items()}
      state = ev._eval_fn(p_k, t, ops, res)
      new = jax.tree_util.tree_map(
          lambda a, b: a + b if a.dtype == b.dtype else a, carry, state)
      return new, ()
    init = ev._eval_fn(p, t, ops, res)
    out, _ = lax.scan(step, init, ks)
    return out

  scan_jit = jax.jit(scan_eval, static_argnames=())

  def fetch(state):
    # A value fetch is the only reliable execution barrier through the
    # remote tunnel (block_until_ready returns before execution there).
    leaf = jax.tree_util.tree_leaves(state.sum_weights)[0]
    return float(jnp.asarray(leaf).sum())

  # Measure dispatch+fetch round-trip latency (median of 5) to subtract.
  tiny = jax.jit(lambda v: v + 1)
  z = jax.device_put(jnp.zeros(()))
  float(tiny(z))
  lat_samples = []
  for i in range(5):
    lat0 = time.perf_counter()
    float(tiny(z + i))
    lat_samples.append(time.perf_counter() - lat0)
  latency = sorted(lat_samples)[len(lat_samples) // 2]

  def run_scan(k_iters):
    ks = jnp.arange(1.0, k_iters + 1.0)
    args = (p, t, ks, bench_ops, bench_res)
    fetch(scan_jit(*args))  # warmup/compile (remote compile can be slow)
    best = float('inf')
    for _ in range(3):
      t0 = time.perf_counter()
      fetch(scan_jit(*args))
      best = min(best, time.perf_counter() - t0)
    return best

  # Fixed iteration count: ONE compile (remote compilation of the scan
  # program dominates; an adaptive size would recompile per size). Sized so
  # device work dominates the ~25ms tunnel latency for both workloads.
  k_iters = 64 if has_prob else 4096
  total = run_scan(k_iters)
  # k_iters scanned steps + 1 init step inside the program.
  dt = max(total - latency, 1e-9) / (k_iters + 1)

  gridpoints = n_lead * nlat * nlon
  value = gridpoints * n_stats / dt

  # CRPS spread implementation: on TPU this routes through the rank-native
  # Pallas half-pairwise kernel (ops/crps_pairwise.py), which replaced the
  # XLA-sort PWM form as the default after a measured 2.8-2.9x win on this
  # workload (fused step 16.2 vs 45.9 ms; headline 780 vs 271 M stats/s);
  # the round-3 sliced + group-tiled pair enumeration (no per-shift
  # roll, 5-member group re-use) lifted the headline again to ~1370 M
  # stats/s (kernel 14.1 -> 6.9 ms at M=50).
  # Set WBX_NO_PALLAS=1 for the sort path. History: a Pallas bitonic SORT
  # kernel was tried in round 1 and removed (tied with XLA sort); the win
  # comes from abandoning sorting altogether — the half-pairwise sum is
  # pure elementwise VPU work at the f32 roofline, and the kernel blocks
  # the native array rank because reshaping TPU tiled layouts costs more
  # than the sort did. See BASELINE.md.

  # Numpy single-process baseline on a smaller slice, scaled.
  frac = 4  # evaluate 1/frac of the leads to keep the baseline quick
  base_dt, base_nstats = _numpy_baseline_time(
      pred_np[..., :n_lead // frac, :, :] if ens else
      pred_np[:, :n_lead // frac], tgt_np[:, :n_lead // frac],
      np.cos(np.deg2rad(lats))[:, None].astype(np.float32), ens)
  base_value = (gridpoints // frac) * base_nstats / base_dt

  result = {
      'metric': ('crps+rmse_0.25deg_50ens' if has_prob
                 else 'rmse_mae_bias_0.25deg'),
      'value': round(value / 1e6, 3),
      'unit': 'M_gridpoint_stats_per_sec',
      'vs_baseline': round(value / base_value, 2),
  }
  if os.environ.get('WBX_BENCH_FULL', '1') != '0':
    try:
      result['full_suite'] = full_suite(latency)
    except Exception as e:  # never lose the headline to a full-suite failure
      result['full_suite_error'] = f'{type(e).__name__}: {e}'
  print(json.dumps(result))


def full_suite(latency, time_budget_s=240.0):
  """Per-family ms/step at 0.25° with the PRODUCTION aggregation shape.

  Every family runs with the benchmark CLI's aggregator
  (``apps/run_benchmark_evaluation.py:213-226``): 17 ECMWF regions
  land-augmented to 34 bins, exact sin-bounds area weighting, masked
  aggregation. Families cover the surfaces the headline bench misses:
  SEEPS climatology gathers, FSS convolutions, REV threshold fan-out,
  rank histogram, vector RMSE (VERDICT r2 weak item 2).

  Returns {family: {'ms_per_step': x, 'stats_per_step': n}} plus meta.
  Families past ``time_budget_s`` are reported as 'skipped' so a slow
  tunnel day degrades coverage, not the whole bench.
  """
  import gc

  import jax
  import jax.numpy as jnp
  from jax import lax

  from weatherbenchx_tpu import aggregation, binning, weighting
  from weatherbenchx_tpu.apps import configs as configs_lib
  from weatherbenchx_tpu.darray import DimArray
  from weatherbenchx_tpu.metrics import (categorical, deterministic,
                                         probabilistic, spatial)
  from weatherbenchx_tpu.parallel import evaluator as evaluator_lib

  t_start = time.perf_counter()
  n_lead, nlat, nlon = 4, 721, 1440
  if os.environ.get('WBX_BENCH_GRID') == 'small':  # CI/CPU smoke only
    nlat, nlon = 73, 144
  lats = np.linspace(-90, 90, nlat)
  lons = np.linspace(0, 360, nlon, endpoint=False)
  init = np.array(['2020-01-03'], dtype='datetime64[ns]')
  leads = (np.arange(n_lead) * np.timedelta64(6, 'h')
           ).astype('timedelta64[ns]')
  base_coords = {'init_time': init, 'lead_time': leads,
                 'latitude': lats, 'longitude': lons}
  gdims = ('init_time', 'lead_time', 'latitude', 'longitude')
  gshape = (1, n_lead, nlat, nlon)
  rng = np.random.default_rng(0)

  # Production aggregator: 17 regions + land bins = 34, masked, weighted.
  yy, xx = np.meshgrid(np.deg2rad(lats), np.deg2rad(lons), indexing='ij')
  land = (np.sin(3 * yy) * np.cos(4 * xx) > 0.1)
  land_da = DimArray(land, ('latitude', 'longitude'),
                     {'latitude': lats, 'longitude': lons})
  agg = aggregation.Aggregator(
      reduce_dims=['init_time', 'latitude', 'longitude'],
      bin_by=[binning.Regions(configs_lib.REGIONS, land_sea_mask=land_da)],
      weigh_by=[weighting.GridAreaWeighting()],
      masked=True)

  def grid(seed, ens=None, positive=False, scale=1.0, boolean=False):
    r = np.random.default_rng(seed)
    shape = ((ens,) + gshape) if ens else gshape
    a = r.random(shape, dtype=np.float32)
    if positive:
      a = (-np.log(a + 1e-6) * scale).astype(np.float32)
    elif boolean:
      return a > 0.5
    coords = dict(base_coords)
    dims = gdims
    if ens:
      coords['number'] = np.arange(ens)
      dims = ('number',) + gdims
    return DimArray(a, dims, coords)

  clim_hours = np.array([0, 6, 12, 18])
  clim_doys = np.arange(1, 11)

  def clim(seed, lo=0.0, hi=1.0):
    r = np.random.default_rng(seed)
    a = r.uniform(lo, hi, (len(clim_hours), len(clim_doys), nlat, nlon)
                  ).astype(np.float32)
    return DimArray(a, ('hour', 'dayofyear', 'latitude', 'longitude'),
                    {'hour': clim_hours, 'dayofyear': clim_doys,
                     'latitude': lats, 'longitude': lons})

  def roofline_peaks():
    """Measured attainable peaks on THIS chip/stack (not datasheet numbers):
    HBM stream bandwidth via a saturating elementwise pass, VPU f32
    throughput via a resident FMA chain. Per-family %%-of-roofline is
    computed against these, so it reports distance from what the stack can
    actually deliver here."""
    n = 64 * 1024 * 1024  # 256 MB f32: far beyond VMEM, HBM-streamed
    x0 = jax.device_put(jnp.zeros(n, jnp.float32))

    def bw_scan(x, ks):
      def step(c, k):
        return c + k, ()  # read N + write N per step (k is scalar)
      out, _ = lax.scan(step, x, ks)
      return out

    bw_jit = jax.jit(bw_scan)
    # Long scans + best-of-3: the peak is a calibration constant, so take
    # the fastest rep (slow reps are tunnel/launch jitter, not the chip),
    # and size the scan so on-chip time ≫ the ~25 ms tunnel latency —
    # k=16 put ~15 ms of compute against that latency and the subtraction
    # made the "measured peak" swing 2× between runs.
    k_bw = 96  # ~50 GB of traffic ≈ 100 ms on-chip
    # Vary ks between reps: identical (program, args) executions are
    # memoized somewhere in the remote tunnel (see bench headline scan).
    float(jnp.asarray(bw_jit(x0, jnp.arange(1.0, k_bw + 1.0))[0]))
    dt_bw = np.inf
    for rep in range(3):
      t0 = time.perf_counter()
      float(jnp.asarray(bw_jit(x0, jnp.arange(2.0 + rep, k_bw + 2.0 + rep))[0]))
      dt_bw = min(dt_bw, max(
          (time.perf_counter() - t0 - latency) / k_bw, 1e-9))
    hbm_gbps = n * 8 / dt_bw / 1e9  # 4B read + 4B write per element

    m = 512 * 1024  # 2 MB: VMEM-resident across the unrolled FMA chain
    y0 = jax.device_put(jnp.full(m, 1.0000001, jnp.float32))
    unroll = 64

    def fma_scan(y, ks):
      def step(c, k):
        for _ in range(unroll):
          c = c * 1.0000001 + 1e-7 * k
        return c, ()
      out, _ = lax.scan(step, y, ks)
      return out

    fma_jit = jax.jit(fma_scan)
    k_fma = 4096  # ~0.5 Tops total ≈ 100 ms on-chip (same sizing rule)
    float(jnp.asarray(fma_jit(y0, jnp.arange(1.0, k_fma + 1.0))[0]))
    dt_fma = np.inf
    for rep in range(3):
      t0 = time.perf_counter()
      float(jnp.asarray(
          fma_jit(y0, jnp.arange(2.0 + rep, k_fma + 2.0 + rep))[0]))
      dt_fma = min(dt_fma, max(
          (time.perf_counter() - t0 - latency) / k_fma, 1e-9))
    vpu_gops = 2 * unroll * m / dt_fma / 1e9  # FMA = 2 ops

    return {'hbm_GBps': round(hbm_gbps, 1),
            'vpu_f32_Gops': round(vpu_gops, 1)}

  peaks = roofline_peaks()

  def measure(metrics, preds, tgts, k_iters, n_stats, extra_flops_fn=None,
              min_bytes=None):
    ev = evaluator_lib.ChunkEvaluator(metrics=metrics, aggregator=agg)
    p = jax.device_put(
        evaluator_lib.prepare_chunk(preds, ev._clim_stats,
                                    is_predictions=True))
    t = jax.device_put(evaluator_lib.prepare_chunk(tgts))

    ops = ev.operands_for(p, t)
    res = ev.resources()

    def scan_eval(p, t, ks, ops, res):
      def step(carry, k):
        p_k = {name: da.copy(data=da.data + 1e-6 * k)
               for name, da in p.items()}
        state = ev._eval_fn(p_k, t, ops, res)
        new = jax.tree_util.tree_map(
            lambda a, b: a + b if a.dtype == b.dtype else a, carry, state)
        return new, ()
      out, _ = lax.scan(step, ev._eval_fn(p, t, ops, res), ks)
      return out

    fn = jax.jit(scan_eval)

    def fetch(state):
      leaf = jax.tree_util.tree_leaves(state.sum_weights)[0]
      return float(jnp.asarray(leaf).sum())

    def roofline(out, k_iters, dt):
      """Attach the roofline accounting to a family's result row.

      Two views, both against the MEASURED attainable peaks:

      * ``pct_of_min_io_roofline``: measured step time vs the ANALYTIC
        minimum HBM traffic — every input array and aggregation operand
        read exactly once (a perfectly-fused implementation; outputs are
        negligible). This is the honest %%-of-roofline: a low number
        demands a written reason (BASELINE.md round 4 carries one per
        family — e.g. the deterministic family's masked aggregation is
        VPU LOAD-limited, not HBM-limited: 2·R·B·N operand loads put its
        floor at ~3.0 ms where min-IO says 0.37). Two caveats: a sub-ms
        family's dt sits inside the tunnel-latency subtraction's
        resolution, so its pct can print >100 (read as "at the floor"),
        and XLA legitimately hoists loop-invariant operand products out
        of the measured scan — as the production pipeline amortizes them
        across chunks — which can push a family past the single-shot
        min-IO bound.
      * ``xla_cost_*``: the compiled single-step executable's own cost
        model (per-op post-fusion sums). Operands are counted once per
        CONSUMING op, so these exceed true traffic wherever fusion keeps
        data in VMEM — useful as an upper envelope and for spotting
        accidental materialization, not as a divisor. Pallas custom calls
        report zero flops to XLA, so families carrying one add the
        kernel's arithmetic analytically via extra_flops_fn.
      """
      del k_iters
      if min_bytes is not None:
        t_io = min_bytes / (peaks['hbm_GBps'] * 1e9)
        out['min_io_MB'] = round(min_bytes / 1e6, 1)
        pct = 100 * t_io / dt
        if pct > 100:
          # A sub-ms step sits inside the tunnel-latency subtraction's
          # resolution (and XLA may hoist loop-invariant operand products
          # out of the measured scan); >100% of a lower bound is not
          # attainable — clamp and say why instead of printing it.
          out['pct_of_min_io_roofline'] = 100.0
          out['min_io_note'] = ('at_floor: raw pct '
                                f'{round(pct, 1)} exceeds 100 — dt inside '
                                'timing resolution / hoisted operands')
        else:
          out['pct_of_min_io_roofline'] = round(pct, 1)
      try:
        one = jax.jit(lambda p_, t_, o_, r_: ev._eval_fn(p_, t_, o_, r_))
        ca = one.lower(p, t, ops, res).compile().cost_analysis()
        if isinstance(ca, list):
          ca = ca[0] if ca else {}
      except Exception:
        return
      flops = float(ca.get('flops', 0.0))
      hbm = float(ca.get('bytes accessed', 0.0))
      if extra_flops_fn is not None:
        flops += extra_flops_fn()
      out['xla_cost_flops_G'] = round(flops / 1e9, 2)
      out['xla_cost_bytes_MB'] = round(hbm / 1e6, 1)

    gridpoints = n_lead * nlat * nlon
    while True:
      fetch(fn(p, t, jnp.arange(1.0, k_iters + 1.0), ops, res))  # compile
      # Best-of-3, each rep with distinct scan inputs (identical
      # (program, args) executions can be memoized in the tunnel): reps
      # cost only run time — the compile above is the expensive part.
      best = float('inf')
      for rep in range(3):
        ks = jnp.arange(2.0 + rep, k_iters + 2.0 + rep)
        t0 = time.perf_counter()
        fetch(fn(p, t, ks, ops, res))
        best = min(best, time.perf_counter() - t0)
      dt = (best - latency) / (k_iters + 1)
      if dt * (k_iters + 1) < 0.25 * latency:
        # The whole scan is inside the latency noise floor. Jump straight
        # to the longest scan (ONE recompile — remote compiles dominate,
        # and scan length barely affects compile time); only report the
        # resolution bound if even that can't clear the floor (or the
        # family's share of the time budget is spent).
        if (k_iters < 256
            and time.perf_counter() - t_start < time_budget_s):
          k_iters = 256
          continue
        return {'ms_per_step': f'<{latency * 1e3 / (k_iters + 1):.2f}',
                'below_timing_resolution': True}
      dt = max(dt, 1e-9)
      out = {'ms_per_step': round(dt * 1e3, 2),
             'gridpoint_stats_per_sec_M': round(
                 gridpoints * n_stats / dt / 1e6, 1)}
      roofline(out, k_iters, dt)
      return out

  # Analytic minimum HBM traffic helpers: every input read exactly once.
  var_bytes = n_lead * nlat * nlon * 4          # one (1,L,lat,lon) f32 var
  mask_bytes = 34 * nlat * nlon * 4             # 34-bin region mask stack

  def fam_det():
    preds = {'geopotential': grid(1), '2m_temperature': grid(2)}
    tgts = {'geopotential': grid(3), '2m_temperature': grid(4)}
    c = {'geopotential': clim(5), '2m_temperature': clim(6)}
    metrics = {
        'rmse': deterministic.RMSE(), 'mse': deterministic.MSE(),
        'bias': deterministic.Bias(),
        'acc': deterministic.ACC(climatology=c),
        'activity': deterministic.PredictionActivity(climatology=c),
    }
    # unique stats: Error, SquaredError, SqPredAnom, SqTgtAnom, AnomCov ×2var
    # min IO: 2 preds + 2 tgts + 2 gathered clim slices + the mask stack
    return measure(metrics, preds, tgts, k_iters=24, n_stats=10,
                   min_bytes=6 * var_bytes + mask_bytes)

  def fam_vector():
    preds = {'u': grid(7), 'v': grid(8)}
    tgts = {'u': grid(9), 'v': grid(10)}
    metrics = {'vector_rmse': deterministic.WindVectorRMSE(
        u_name='u', v_name='v', vector_name='wind')}
    return measure(metrics, preds, tgts, k_iters=24, n_stats=1,
                   min_bytes=4 * var_bytes + mask_bytes)

  def fam_seeps():
    preds = {'total_precipitation_24hr': grid(11, positive=True,
                                              scale=0.002)}
    tgts = {'total_precipitation_24hr': grid(12, positive=True,
                                             scale=0.002)}
    c = {'total_precipitation_24hr_seeps_threshold': clim(13, 0.001, 0.003),
         'total_precipitation_24hr_seeps_dry_fraction': clim(14, 0.05, 0.95)}
    metrics = {'seeps': categorical.SEEPS(
        variables=['total_precipitation_24hr'], climatology=c)}
    # preds + tgts + 2 gathered clim fields + mask stack
    return measure(metrics, preds, tgts, k_iters=24, n_stats=1,
                   min_bytes=4 * var_bytes + mask_bytes)

  def fam_fss():
    preds = {'precip': DimArray(grid(15, boolean=True), gdims, base_coords)}
    tgts = {'precip': DimArray(grid(16, boolean=True), gdims, base_coords)}
    metrics = {'fss': spatial.FSS(neighborhood_size_in_pixels=[3],
                                  wrap_longitude=True)}
    # bool inputs (1 B/elt) + mask stack
    return measure(metrics, preds, tgts, k_iters=12, n_stats=3,
                   min_bytes=2 * (var_bytes // 4) + mask_bytes)

  def fam_prob():
    m = 50
    preds = {'2m_temperature': grid(17, ens=m)}
    tgts = {'2m_temperature': grid(18)}
    metrics = {
        'crps': probabilistic.CRPSEnsemble(use_sort=True),
        'spread_skill': probabilistic.UnbiasedSpreadSkillRatio(),
        'unbiased_mean_rmse': probabilistic.UnbiasedEnsembleMeanRMSE(),
    }

    def pallas_spread_flops():
      """The CRPS spread Pallas kernel is a custom call — zero flops in
      XLA's cost model; add its arithmetic analytically. Sort form
      (default at m>=20): bitonic network on the padded power-of-two lane
      count (2 ops per compare-exchange) + the PWM weighted sum; pairwise
      form: 3 ops per unordered pair."""
      if os.environ.get('WBX_NO_PALLAS') == '1':
        return 0.0
      n_points = n_lead * nlat * nlon
      from weatherbenchx_tpu.ops import crps_pairwise
      if crps_pairwise._spread_form(m) == 'sort':
        padded = 1 << (m - 1).bit_length()
        stages = padded.bit_length() - 1
        ces = padded // 2 * stages * (stages + 1) // 2
        return n_points * (2 * ces + 3 * m)
      return n_points * 3 * m * (m - 1) // 2

    # 50-member ensemble + target + mask stack, each read once
    return measure(metrics, preds, tgts, k_iters=12, n_stats=4,
                   extra_flops_fn=pallas_spread_flops,
                   min_bytes=(m + 1) * var_bytes + mask_bytes)

  def fam_rank_histogram():
    preds = {'2m_temperature': grid(19, ens=50)}
    tgts = {'2m_temperature': grid(20)}
    metrics = {'rank_histogram': probabilistic.RankHistogram()}
    return measure(metrics, preds, tgts, k_iters=12, n_stats=51,
                   min_bytes=51 * var_bytes + mask_bytes)

  def fam_rev():
    ens_frac = np.random.default_rng(21).random(
        (8,) + gshape, dtype=np.float32)
    prob = (ens_frac > 0.5).mean(axis=0).astype(np.float32)
    preds = {'2m_temperature': DimArray(prob, gdims, base_coords)}
    tgts = {'2m_temperature': DimArray(grid(22, boolean=True), gdims,
                                       base_coords)}
    metrics = {'rev': probabilistic.RelativeEconomicValue(
        probability_thresholds=(np.arange(8) + 0.5) / 8,
        statistic_suffix='bench8',
        cost_loss_ratios=np.geomspace(0.01, 1, 9)[:-1])}
    # probability field + bool target + mask stack
    return measure(metrics, preds, tgts, k_iters=12, n_stats=24,
                   min_bytes=var_bytes + var_bytes // 4 + mask_bytes)

  families = [
      ('deterministic_acc_activity', fam_det),
      ('probabilistic_crps_spread', fam_prob),
      ('seeps', fam_seeps),
      ('fss', fam_fss),
      ('rank_histogram', fam_rank_histogram),
      ('rev', fam_rev),
      ('vector_rmse', fam_vector),
  ]
  out = {'bins': 34, 'grid': '0.25deg', 'n_lead': n_lead, 'masked': True,
         'roofline_peaks_measured': peaks}
  only = os.environ.get('WBX_BENCH_FAMILIES')  # comma list, for A/B runs
  if only:
    wanted = {f.strip() for f in only.split(',')}
    families = [(n, f) for n, f in families if n in wanted]
  for name, fn in families:
    if time.perf_counter() - t_start > time_budget_s:
      out[name] = 'skipped_time_budget'
      continue
    t_fam = time.perf_counter()
    try:
      out[name] = fn()
    except Exception as e:
      out[name] = f'error: {type(e).__name__}: {e}'
    print(f'# full_suite {name}: {time.perf_counter() - t_fam:.1f}s '
          f'-> {out[name]}', file=sys.stderr, flush=True)
    gc.collect()
  return out


if __name__ == '__main__':
  main()
