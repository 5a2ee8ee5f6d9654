"""Statistical inference: frequentist simulation tests.

Mirrors the reference's test strategy: simulate thousands of replicate
series from known processes, run inference on all replicates at once, and
assert CI coverage / stderr ratios within binomial plausibility
(``t_test_test.py``, ``bootstrap_test.py``, ``autodiff_test.py``).
"""

import numpy as np
import pytest

from weatherbenchx_tpu.darray import DimArray
from weatherbenchx_tpu.inference import (autodiff, base, baseline_comparison,
                                         block_length, bootstrap, t_test,
                                         test_utils, utils)


def _da(values, dims):
  return DimArray(np.asarray(values, dtype=np.float64), dims)


class TestAutodiff:
  def test_linear_mean_recovers_deviations(self):
    rng = np.random.default_rng(0)
    data = _da(rng.standard_normal((20,)), ('unit',))
    metrics, state = test_utils.metrics_and_agg_state_for_mean(data)
    values, tangents = (
        autodiff.per_unit_values_linearized_around_mean_statistics(
            metrics, state, 'unit'))
    v = np.asarray(data.values)
    np.testing.assert_allclose(
        values['mean']['variable'].item(), v.mean(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tangents['mean']['variable'].values), v - v.mean(),
        atol=1e-6)

  def test_ratio_of_means_delta_method(self):
    rng = np.random.default_rng(1)
    num = rng.standard_normal((500,)) + 5.0
    den = rng.standard_normal((500,)) + 10.0
    metrics, state = test_utils.metrics_and_agg_state_for_ratio_of_means(
        _da(num, ('unit',)), _da(den, ('unit',)))
    values, tangents = (
        autodiff.per_unit_values_linearized_around_mean_statistics(
            metrics, state, 'unit'))
    ratio = num.mean() / den.mean()
    np.testing.assert_allclose(
        values['ratio_of_means']['variable'].item(), ratio, rtol=1e-6)
    # Analytic tangents: (n_i - n̄)/d̄ - n̄ (d_i - d̄)/d̄².
    expected = (num - num.mean()) / den.mean() - num.mean() * (
        den - den.mean()) / den.mean() ** 2
    np.testing.assert_allclose(
        np.asarray(tangents['ratio_of_means']['variable'].values),
        expected, atol=1e-6)
    # Tangents are zero-mean.
    assert abs(np.asarray(
        tangents['ratio_of_means']['variable'].values).mean()) < 1e-10

  def test_weighted_mean_normalization_included(self):
    # Non-constant weights: linearization must include 1/sum_weights.
    rng = np.random.default_rng(2)
    data = rng.standard_normal((50,))
    weights = rng.random(50) + 0.5
    from weatherbenchx_tpu import aggregation
    state = aggregation.AggregationState(
        sum_weighted_statistics={'MeanPrediction': {
            'variable': _da(data * weights, ('unit',))}},
        sum_weights={'MeanPrediction': {
            'variable': _da(weights, ('unit',))}})
    metrics = {'mean': test_utils.MeanPrediction()}
    values, tangents = (
        autodiff.per_unit_values_linearized_around_mean_statistics(
            metrics, state, 'unit'))
    np.testing.assert_allclose(
        values['mean']['variable'].item(),
        (data * weights).sum() / weights.sum(), rtol=1e-6)
    wm = (data * weights).sum() / weights.sum()
    expected = (data * weights - wm * weights) / weights.mean()
    np.testing.assert_allclose(
        np.asarray(tangents['mean']['variable'].values), expected, atol=1e-6)


class TestIIDTTest:
  def test_coverage_iid_gaussian(self):
    rng = np.random.default_rng(3)
    true_mean, n, reps = 1.5, 40, 2000
    data = _da(rng.standard_normal((n, reps)) + true_mean,
               ('unit', 'replicates'))
    metrics, state = test_utils.metrics_and_agg_state_for_mean(data)
    inference = t_test.IID(metrics, state, experimental_unit_dim='unit')
    test_utils.assert_coverage_probability_estimate_plausible(
        inference, true_mean, alpha=0.05)

  def test_stderr_matches_classic_formula(self):
    rng = np.random.default_rng(4)
    v = rng.standard_normal(30)
    metrics, state = test_utils.metrics_and_agg_state_for_mean(
        _da(v, ('unit',)))
    inference = t_test.IID(metrics, state, experimental_unit_dim='unit')
    np.testing.assert_allclose(
        inference.standard_error_estimates()['mean']['variable'].item(),
        v.std(ddof=1) / np.sqrt(30), rtol=1e-6)
    # p-value consistency with scipy one-sample t-test.
    import scipy.stats
    t_scipy = scipy.stats.ttest_1samp(v, 0.0)
    np.testing.assert_allclose(
        inference.p_values(0.0)['mean']['variable'].item(),
        t_scipy.pvalue, rtol=1e-6)

  def test_significance_tests(self):
    rng = np.random.default_rng(5)
    v = rng.standard_normal(100) + 5.0
    metrics, state = test_utils.metrics_and_agg_state_for_mean(
        _da(v, ('unit',)))
    inference = t_test.IID(metrics, state, experimental_unit_dim='unit')
    assert bool(np.asarray(
        inference.significance_tests(0.0)['mean']['variable'].values))
    # At the sample mean itself, p = 1: never significant.
    assert not bool(np.asarray(
        inference.significance_tests(float(v.mean()))[
            'mean']['variable'].values))


class TestAR2TTest:
  def test_coverage_under_ar2(self):
    """Mirrors reference t_test_test.py:177-224 (n=1000, phi=(0.5, 0.1))."""
    phi1, phi2, sigma = 0.5, 0.1, 0.1
    true_mean, n, reps = 10.0, 1000, 2000
    data = test_utils.simulate_ar2(
        true_mean, sigma, phi1, phi2, steps=n, replicates=reps,
        rng=np.random.default_rng(6))
    metrics, state = test_utils.metrics_and_agg_state_for_mean(
        _da(data, ('unit', 'replicates')))
    inference = t_test.GeerAR2Corrected(
        metrics, state, experimental_unit_dim='unit')
    test_utils.assert_coverage_probability_estimate_plausible(
        inference, true_mean, alpha=0.05, rtol=0.05,
        coverage_prob_significance_level=0.01)

  def test_iid_undercovers_under_autocorrelation(self):
    data = test_utils.simulate_ar1(
        0.0, 1.0, 0.7, steps=200, replicates=1000,
        rng=np.random.default_rng(7))
    metrics, state = test_utils.metrics_and_agg_state_for_mean(
        _da(data, ('unit', 'replicates')))
    iid = t_test.IID(metrics, state, experimental_unit_dim='unit')
    lower, upper = iid.confidence_intervals(0.05)
    covered = ((np.asarray(lower['mean']['variable'].values) <= 0)
               & (0 <= np.asarray(upper['mean']['variable'].values)))
    # Badly below nominal coverage 0.95 under strong autocorrelation.
    assert covered.mean() < 0.85


class TestHACEWC:
  def test_coverage_under_ar1(self):
    data = test_utils.simulate_ar1(
        1.0, 1.0, 0.5, steps=400, replicates=1000,
        rng=np.random.default_rng(8))
    metrics, state = test_utils.metrics_and_agg_state_for_mean(
        _da(data, ('unit', 'replicates')))
    inference = t_test.LazarusHACEWC(
        metrics, state, experimental_unit_dim='unit')
    test_utils.assert_coverage_probability_estimate_plausible(
        inference, 1.0, alpha=0.05, rtol=0.03,
        coverage_prob_significance_level=0.01)


class TestIIDBootstrap:
  def test_coverage_and_stderr(self):
    rng = np.random.default_rng(9)
    n, reps = 60, 400
    data = _da(rng.standard_normal((n, reps)) + 2.0, ('unit', 'replicates'))
    metrics, state = test_utils.metrics_and_agg_state_for_mean(data)
    inference = bootstrap.IIDBootstrap(
        metrics, state, experimental_unit_dim='unit', n_replicates=500,
        seed=0)
    test_utils.assert_coverage_probability_estimate_plausible(
        inference, 2.0, alpha=0.1, rtol=0.05,
        coverage_prob_significance_level=0.01)
    # Bootstrap stderr ~ classic stderr on average.
    se = np.asarray(inference.standard_error_estimates()[
        'mean']['variable'].values)
    np.testing.assert_allclose(se.mean(), 1 / np.sqrt(n), rtol=0.1)

  def test_nonlinear_exp_of_mean(self):
    rng = np.random.default_rng(10)
    data = _da(rng.standard_normal((100, 200)) * 0.5,
               ('unit', 'replicates'))
    metrics, state = test_utils.metrics_and_agg_state_for_exp_of_mean(data)
    inference = bootstrap.IIDBootstrap(
        metrics, state, experimental_unit_dim='unit', n_replicates=500,
        seed=1)
    test_utils.assert_coverage_probability_estimate_plausible(
        inference, 1.0, metric_name='exp_mean', alpha=0.1, rtol=0.1,
        coverage_prob_significance_level=0.01)


class TestClusterBootstrap:
  def test_cluster_resampling(self):
    rng = np.random.default_rng(11)
    n_clusters, cluster_size = 50, 4
    # Strong within-cluster dependence: same value repeated in cluster.
    cluster_vals = rng.standard_normal((n_clusters, 1))
    data = np.repeat(cluster_vals, cluster_size, axis=1).reshape(-1)
    cluster_ids = np.repeat(np.arange(n_clusters), cluster_size)
    da = DimArray(data, ('unit',),
                  {'cluster': (('unit',), cluster_ids)})
    metrics, state = test_utils.metrics_and_agg_state_for_mean(da)
    inference = bootstrap.ClusterBootstrap(
        metrics, state, experimental_unit_coord='cluster',
        n_replicates=500, seed=2)
    se_cluster = inference.standard_error_estimates()[
        'mean']['variable'].item()
    # Compare with naive IID bootstrap, which should underestimate stderr
    # by about sqrt(cluster_size).
    iid = bootstrap.IIDBootstrap(
        metrics, state, experimental_unit_dim='unit', n_replicates=500,
        seed=3)
    se_iid = iid.standard_error_estimates()['mean']['variable'].item()
    assert se_cluster / se_iid > 1.5


class TestStationaryBootstrap:
  def test_block_length_reasonable_for_ar1(self):
    data = test_utils.simulate_ar1(
        0.0, 1.0, 0.5, steps=2000, replicates=1,
        rng=np.random.default_rng(12))[:, 0]
    b = block_length.optimal_block_length_stationary(data)
    assert 2.0 < b < 50.0
    # White noise: short blocks.
    wn = np.random.default_rng(13).standard_normal(2000)
    assert block_length.optimal_block_length_stationary(wn) < 5.0

  def test_stderr_close_to_true_ar1_stderr(self):
    """Mirrors reference bootstrap_test.py:153-236."""
    phi, sigma, n, reps = 0.6, 1.0, 400, 200
    data = test_utils.simulate_ar1(
        0.0, sigma, phi, steps=n, replicates=reps,
        rng=np.random.default_rng(14))
    metrics, state = test_utils.metrics_and_agg_state_for_mean(
        _da(data, ('unit', 'replicates')))
    inference = bootstrap.StationaryBootstrap(
        metrics, state, experimental_unit_dim='unit', n_replicates=200,
        seed=4)
    se = np.asarray(inference.standard_error_estimates()[
        'mean']['variable'].values)
    true_se = test_utils.gaussian_ar1_true_stderr_of_sample_mean(
        sigma, phi, n)
    np.testing.assert_allclose(se.mean(), true_se, rtol=0.15)
    # IID bootstrap underestimates under autocorrelation:
    iid = bootstrap.IIDBootstrap(
        metrics, state, experimental_unit_dim='unit', n_replicates=200,
        seed=5)
    se_iid = np.asarray(iid.standard_error_estimates()[
        'mean']['variable'].values).mean()
    assert se_iid < 0.8 * true_se

  def test_extra_dims_per_slice_block_length(self):
    # A lead_time-like extra dim: block length selected per slice.
    rng = np.random.default_rng(15)
    iid_part = rng.standard_normal((100, 1))
    ar_part = test_utils.simulate_ar1(0., 1., 0.8, steps=100, replicates=1,
                                      rng=rng)
    data = np.concatenate([iid_part, ar_part], axis=1)
    da = DimArray(data, ('unit', 'lead'), {'lead': np.array([0, 1])})
    metrics, state = test_utils.metrics_and_agg_state_for_mean(da)
    inference = bootstrap.StationaryBootstrap(
        metrics, state, experimental_unit_dim='unit', n_replicates=300,
        seed=6)
    out = inference.standard_error_estimates()['mean']['variable']
    assert out.sizes['lead'] == 2
    se = np.asarray(out.values).reshape(-1)
    assert se[1] > 1.5 * se[0]  # AR slice has larger stderr


class TestBaselineComparison:
  def test_paired_difference(self):
    rng = np.random.default_rng(16)
    n, reps = 80, 500
    common = rng.standard_normal((n, reps))
    main = _da(common + 0.3 + 0.1 * rng.standard_normal((n, reps)),
               ('unit', 'replicates'))
    baseline = _da(common + 0.1 * rng.standard_normal((n, reps)),
                   ('unit', 'replicates'))
    m_metrics, m_state = test_utils.metrics_and_agg_state_for_mean(main)
    _, b_state = test_utils.metrics_and_agg_state_for_mean(baseline)
    inference = t_test.IID.for_baseline_comparison(
        m_metrics, m_state, b_state, experimental_unit_dim='unit')
    est = np.asarray(
        inference.point_estimates()['mean']['variable'].values)
    np.testing.assert_allclose(est.mean(), 0.3, atol=0.02)
    # The paired test should reject H0: diff=0 nearly always (power ~1
    # since the common noise cancels).
    sig = np.asarray(inference.significance_tests(0.0)[
        'mean']['variable'].values)
    assert sig.mean() > 0.99
    test_utils.assert_coverage_probability_estimate_plausible(
        inference, 0.3, alpha=0.05, rtol=0.05,
        coverage_prob_significance_level=0.01)


class TestUtils:
  def test_experimental_unit_coord_checks(self):
    from weatherbenchx_tpu import aggregation
    state = aggregation.AggregationState(
        {'s': {'v': _da(np.zeros((3,)), ('unit',))}},
        {'s': {'v': _da(np.ones((3,)), ('unit',))}})
    coord = utils.get_and_check_experimental_unit_coord(state, 'unit')
    np.testing.assert_array_equal(np.asarray(coord.values), [0, 1, 2])
    with pytest.raises(ValueError, match='No experimental unit'):
      utils.get_and_check_experimental_unit_coord(state, 'nope')

  def test_logarithmic_round(self):
    assert utils.logarithmic_round(10.0) == pytest.approx(10.0)
    assert utils.logarithmic_round(9.7, resolution=1) == pytest.approx(10.0)

  def test_apply_to_slices(self):
    da = DimArray(np.arange(6.0).reshape(2, 3), ('a', 'b'),
                  {'a': np.array([0, 1]), 'b': np.array([0, 1, 2])})
    out = utils.apply_to_slices(lambda x: x * 2, da, dim=('a', 'b'))
    np.testing.assert_allclose(np.asarray(out.values), da.values * 2)
    assert out.dims == ('a', 'b')


class TestInferenceOnComplexMetrics:
  def test_rev_under_delta_method(self):
    """REV's vmapped optimal-threshold gather must survive jax.linearize.

    Mirrors the reference's jax-compatible REV path
    (``probabilistic.py:883-936``, tested in ``metrics_test.py:1105-1208``).
    """
    from weatherbenchx_tpu import aggregation
    from weatherbenchx_tpu.darray import DimArray as DA
    from weatherbenchx_tpu.metrics import base as mbase, probabilistic

    rng = np.random.default_rng(0)
    n_units, n_obs = 30, 200
    prob = rng.random((n_units, n_obs))
    target = (rng.random((n_units, n_obs)) < prob).astype(np.float64)
    ens = (rng.random((5, n_units, n_obs)) < prob[None]).astype(np.float64)
    preds = {'v': DA(ens.mean(0), ('unit', 'x'))}
    tgts = {'v': DA(target, ('unit', 'x'))}
    clr = np.geomspace(0.01, 1, 5)[:-1]
    opt = DA(np.full(4, 0.5), ('cost_loss_ratio',), {'cost_loss_ratio': clr})
    metrics = {'rev': probabilistic.RelativeEconomicValue(
        ensemble_size=5, cost_loss_ratios=clr, optimal_thresholds=opt)}
    stats = mbase.compute_unique_statistics_for_all_metrics(
        metrics, preds, tgts)
    state = aggregation.Aggregator(reduce_dims=['x']).aggregate_statistics(
        stats)
    inference = t_test.IID(metrics, state, experimental_unit_dim='unit')
    pt = inference.point_estimates()['rev']['v']
    lo, hi = inference.confidence_intervals(0.05)
    assert pt.dims == ('cost_loss_ratio',)
    assert np.all(np.asarray(lo['rev']['v'].values)
                  <= np.asarray(hi['rev']['v'].values))
    assert np.isfinite(np.asarray(
        inference.standard_error_estimates()['rev']['v'].values)).all()
