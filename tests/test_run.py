import os
import shutil
import tempfile

import numpy as np
import pytest

from ultranest_tpu import NestedSampler, ReactiveNestedSampler, read_file


def gauss2d_loglike(theta):
    return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum(axis=1)


GAUSS2D_ANALYTIC = np.log(2 * np.pi * 0.1**2)  # fully inside the unit cube


def bimodal_loglike(theta):
    a = -0.5 * (((theta - 0.3) / 0.05) ** 2).sum(axis=1)
    b = -0.5 * (((theta - 0.7) / 0.05) ** 2).sum(axis=1)
    return np.logaddexp(a, b)


def transform_unit(x):
    return x


def test_reactive_run_gauss2d():
    sampler = ReactiveNestedSampler(
        ['a', 'b'], gauss2d_loglike, transform=transform_unit,
        vectorized=True, seed=42)
    results = sampler.run(min_num_live_points=100, viz_callback=False,
                          show_status=False, max_num_improvement_loops=0,
                          min_ess=0, dlogz=2.0)
    assert -10 < results['logz'] < 10
    assert 0.005 < results['logzerr'] < 1.0
    assert abs(results['logz'] - GAUSS2D_ANALYTIC) < 3 * max(results['logzerr'], 0.2)
    assert 1 < results['ess'] < 100000
    # posterior concentrated at (0.5, 0.5)
    post = np.array(results['posterior']['mean'])
    np.testing.assert_allclose(post, [0.5, 0.5], atol=0.05)
    assert results['niter'] > 100
    assert results['ncall'] >= results['niter']


def test_reactive_run_counts_calls_exactly():
    ncalls = {'n': 0}

    def counting_loglike(theta):
        ncalls['n'] += len(theta)
        return gauss2d_loglike(theta)

    sampler = ReactiveNestedSampler(
        ['a', 'b'], counting_loglike, transform=transform_unit,
        vectorized=True, seed=1)
    results = sampler.run(min_num_live_points=100, viz_callback=False,
                          show_status=False, max_num_improvement_loops=0,
                          min_ess=0, dlogz=2.0)
    # exact call bookkeeping: the constructor test samples are not counted
    # in results['ncall'], so allow for num_test_samples=2
    assert results['ncall'] == ncalls['n'] - 2, (results['ncall'], ncalls['n'])


def test_reactive_multimodal():
    sampler = ReactiveNestedSampler(
        ['a', 'b'], bimodal_loglike, transform=transform_unit,
        vectorized=True, seed=3)
    results = sampler.run(min_num_live_points=200, viz_callback=False,
                          show_status=False, max_num_improvement_loops=0,
                          min_ess=0, dlogz=2.0)
    # both modes populated
    samples = results['samples']
    frac_lo = (samples[:, 0] < 0.5).mean()
    assert 0.2 < frac_lo < 0.8, frac_lo
    analytic = np.log(2 * 2 * np.pi * 0.05**2)
    assert abs(results['logz'] - analytic) < 1.0


def test_classic_sampler():
    tmp = tempfile.mkdtemp()
    try:
        sampler = NestedSampler(
            ['a', 'b'], gauss2d_loglike, transform=transform_unit,
            vectorized=True, num_live_points=200, log_dir=tmp, seed=5)
        results = sampler.run(max_iters=4000)
        assert abs(results['logz'] - GAUSS2D_ANALYTIC) < 1.0
        sampler.print_results()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_run_resume():
    tmp = tempfile.mkdtemp()
    try:
        kwargs = dict(min_num_live_points=100, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0)
        sampler = ReactiveNestedSampler(
            ['a', 'b'], gauss2d_loglike, transform=transform_unit,
            vectorized=True, log_dir=tmp, resume=True, seed=7)
        results = sampler.run(**kwargs)
        ncall_first = results['ncall']
        logz_first = results['logz']

        # resume: replays stored points, needs no new likelihood calls
        ncalls = {'n': 0}

        def counting_loglike(theta):
            ncalls['n'] += len(theta)
            return gauss2d_loglike(theta)

        sampler2 = ReactiveNestedSampler(
            ['a', 'b'], counting_loglike, transform=transform_unit,
            vectorized=True, log_dir=tmp, resume=True, seed=8)
        results2 = sampler2.run(**kwargs)
        # replay must not re-evaluate more than a handful of points
        assert ncalls['n'] < 0.2 * ncall_first, (ncalls['n'], ncall_first)
        assert abs(results2['logz'] - logz_first) < 0.5
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_read_file():
    tmp = tempfile.mkdtemp()
    try:
        sampler = ReactiveNestedSampler(
            ['a', 'b'], gauss2d_loglike, transform=transform_unit,
            vectorized=True, log_dir=tmp, resume=True, seed=9)
        results = sampler.run(min_num_live_points=100, viz_callback=False,
                              show_status=False, max_num_improvement_loops=0,
                              min_ess=0, dlogz=2.0)
        sequence, results2 = read_file(sampler.logs['run_dir'], 2,
                                       num_bootstraps=10)
        assert abs(results2['logz'] - results['logz']) < 0.5
        assert sequence['niter'] >= results['niter']
        # output files exist
        for fn in ('chains/equal_weighted_post.txt',
                   'chains/weighted_post.txt', 'chains/run.txt',
                   'info/results.json', 'info/post_summary.csv'):
            assert os.path.exists(os.path.join(sampler.logs['run_dir'], fn)), fn
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_reactive_non_vectorized():
    def loglike_scalar(theta):
        return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum()

    sampler = ReactiveNestedSampler(['a', 'b'], loglike_scalar, seed=11)
    results = sampler.run(min_num_live_points=50, viz_callback=False,
                          show_status=False, max_num_improvement_loops=0,
                          min_ess=0, dlogz=2.0, frac_remain=0.5)
    assert abs(results['logz'] - GAUSS2D_ANALYTIC) < 1.5


def test_plateau_handling():
    def plateau_loglike(theta):
        L = gauss2d_loglike(theta)
        return np.where(L < -20, -20.0, L)

    sampler = ReactiveNestedSampler(
        ['a', 'b'], plateau_loglike, transform=transform_unit,
        vectorized=True, seed=13)
    results = sampler.run(min_num_live_points=50, viz_callback=False,
                          show_status=False, max_num_improvement_loops=0,
                          min_ess=0, dlogz=2.0, frac_remain=0.1)
    assert np.isfinite(results['logz'])
