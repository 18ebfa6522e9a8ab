"""Reactive improvement loops: the adaptive widening strategies.

Exercises the defining "reactive" feature (reference integrator.py:
_adaptive_strategy_advice 1578, _find_strategy 1632, _widen_nodes 1358):
after the initial pass, the sampler must add live points until the
requested effective sample size / logZ accuracy targets are met.
"""
import numpy as np
import pytest

from ultranest_tpu import ReactiveNestedSampler


def make_sampler(seed=11):
    def loglike(theta):
        return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum(axis=1)

    return ReactiveNestedSampler(['a', 'b'], loglike, vectorized=True,
                                 seed=seed)


def test_min_ess_widening():
    sampler = make_sampler()
    results = sampler.run(min_num_live_points=50, viz_callback=False,
                          show_status=False, dlogz=10.0, min_ess=400,
                          max_num_improvement_loops=10, frac_remain=0.5)
    assert results['ess'] >= 400, results['ess']

    baseline = make_sampler().run(
        min_num_live_points=50, viz_callback=False, show_status=False,
        dlogz=10.0, min_ess=0, max_num_improvement_loops=0, frac_remain=0.5)
    assert baseline['ess'] < results['ess']
    assert baseline['ncall'] < results['ncall']


def test_dlogz_widening():
    sampler = make_sampler(seed=12)
    results = sampler.run(min_num_live_points=50, viz_callback=False,
                          show_status=False, dlogz=0.1, min_ess=0,
                          max_num_improvement_loops=10, frac_remain=0.01)
    assert results['logzerr'] <= 2 * 0.1 + 0.1, results['logzerr']
    # truth: logZ = log(2*pi*0.1^2) for the 2-d gaussian on U(0,1)^2
    logz_true = np.log(2 * np.pi * 0.01)
    assert abs(results['logz'] - logz_true) < 1.0, results['logz']


def test_improvement_loops_capped():
    """max_num_improvement_loops / max_ncalls bound the widening work."""
    sampler = make_sampler(seed=13)
    results = sampler.run(min_num_live_points=50, viz_callback=False,
                          show_status=False, dlogz=1.0, min_ess=2000,
                          max_num_improvement_loops=1, frac_remain=0.5,
                          max_ncalls=20000)
    # an unreachable target with one loop + call budget must terminate
    assert results['niter'] > 0
    assert np.isfinite(results['logz'])
