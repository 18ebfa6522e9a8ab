"""End-to-end checks of the device segment fast path.

The segment engine (integrator._explore_segments + the popfused segment
kernel) must agree statistically with the classic per-node loop, produce
deterministic results, and hand over cleanly on plateaus.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ultranest_tpu import ReactiveNestedSampler
from ultranest_tpu import integrator as integ
from ultranest_tpu.mlfriends import ScalingLayer, SimpleRegion
from ultranest_tpu.popfused import FusedPopulationSliceSampler

NDIM = 6
SIG = 0.07
NORM = -NDIM * np.log(SIG * np.sqrt(2 * np.pi))


def _loglike(t):
    return -0.5 * (((t - 0.5) / SIG) ** 2).sum(axis=1) + NORM


def _jax_loglike(t):
    return -0.5 * (((t - 0.5) / SIG) ** 2).sum(axis=1) + NORM


def _run(seed, force_classic=False, engine='spec', **kwargs):
    orig = integ.ReactiveNestedSampler._segment_eligible
    if force_classic:
        integ.ReactiveNestedSampler._segment_eligible = \
            lambda self, st, opts: False
    try:
        s = ReactiveNestedSampler(
            ['p%d' % i for i in range(NDIM)], _loglike,
            transform=lambda x: np.asarray(x), vectorized=True, seed=seed)
        s.transform_layer_class = ScalingLayer
        s.stepsampler = FusedPopulationSliceSampler(
            popsize=64, nsteps=2 * NDIM, jax_loglike=_jax_loglike,
            seed=seed, engine=engine)
        res = s.run(min_num_live_points=128, viz_callback=False,
                    show_status=False, max_num_improvement_loops=0,
                    min_ess=0, dlogz=1.0, frac_remain=0.05,
                    region_class=SimpleRegion,
                    cluster_num_live_points=0, **kwargs)
        return res, s
    finally:
        integ.ReactiveNestedSampler._segment_eligible = orig


def test_segment_engine_engages_and_is_correct():
    """Segments actually run, and logz matches the analytic truth."""
    res, s = _run(seed=2)
    assert getattr(s, '_segment_exits', None), \
        'segment fast path never engaged'
    assert abs(res['logz']) < 4 * res['logzerr'] + 0.2, \
        (res['logz'], res['logzerr'])
    # bookkeeping invariants: one weight row and one saved id per node
    niter = res['niter']
    assert len(res['weighted_samples']['points']) > 100
    assert np.isfinite(res['logzerr'])


def test_sync_engine_gets_segment_path():
    """The lockstep engine exposes a walk-only form for segments."""
    res, s = _run(seed=7, engine='sync')
    assert getattr(s, '_segment_exits', None), \
        'segment fast path never engaged for the sync engine'
    assert abs(res['logz']) < 4 * res['logzerr'] + 0.2, \
        (res['logz'], res['logzerr'])


def test_async_engine_gets_segment_path():
    """The async engine (spec kernel at depth 1) runs device segments."""
    res, s = _run(seed=3, engine='async')
    assert getattr(s, '_segment_exits', None), \
        'segment fast path never engaged for the async engine'
    assert abs(res['logz']) < 4 * res['logzerr'] + 0.2, \
        (res['logz'], res['logzerr'])
    # the async engine's selling point: fewer billed evaluations than
    # the speculative engine (mean shrink count vs depth-D rows/round)
    res_spec, _ = _run(seed=3, engine='spec')
    assert res['ncall'] < res_spec['ncall'], \
        (res['ncall'], res_spec['ncall'])


def test_rwalk_engine_gets_segment_path():
    """The random-walk engine runs device segments and stays correct."""
    from ultranest_tpu.popfused import FusedPopulationRandomWalkSampler
    s = ReactiveNestedSampler(
        ['p%d' % i for i in range(NDIM)], _loglike,
        transform=lambda x: np.asarray(x), vectorized=True, seed=8)
    s.transform_layer_class = ScalingLayer
    s.stepsampler = FusedPopulationRandomWalkSampler(
        popsize=64, nsteps=4 * NDIM, jax_loglike=_jax_loglike, seed=8,
        scale=0.3)
    res = s.run(min_num_live_points=128, viz_callback=False,
                show_status=False, max_num_improvement_loops=0,
                min_ess=0, dlogz=1.0, frac_remain=0.05,
                region_class=SimpleRegion, cluster_num_live_points=0)
    assert getattr(s, '_segment_exits', None), \
        'segment fast path never engaged for the rwalk engine'
    assert abs(res['logz']) < 4 * res['logzerr'] + 0.35, \
        (res['logz'], res['logzerr'])


def test_segment_matches_classic_statistically():
    """Segment and classic paths agree within their error bars."""
    res_c, _ = _run(seed=5, force_classic=True)
    res_s, _ = _run(seed=5)
    tol = 3 * (res_c['logzerr'] + res_s['logzerr'])
    assert abs(res_c['logz'] - res_s['logz']) < tol, \
        (res_c['logz'], res_s['logz'], tol)
    # same order of magnitude of work
    assert 0.3 < res_s['ncall'] / res_c['ncall'] < 3.0


def test_segment_deterministic():
    """Same seed, same results — device RNG streams are deterministic."""
    r1, _ = _run(seed=11)
    r2, _ = _run(seed=11)
    assert r1['ncall'] == r2['ncall']
    assert r1['niter'] == r2['niter']
    np.testing.assert_allclose(r1['logz'], r2['logz'], rtol=1e-12)


@pytest.mark.parametrize("engine", ['spec', 'async', 'sync', 'rwalk'])
def test_segment_mesh_sharded(engine):
    """Walk sharded over an 8-device mesh, consume replicated."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    from ultranest_tpu.parallel import make_mesh
    from ultranest_tpu.popfused import FusedPopulationRandomWalkSampler
    mesh = make_mesh(8)
    s = ReactiveNestedSampler(
        ['p%d' % i for i in range(NDIM)], _loglike,
        transform=lambda x: np.asarray(x), vectorized=True, seed=4)
    s.transform_layer_class = ScalingLayer
    if engine == 'rwalk':
        s.stepsampler = FusedPopulationRandomWalkSampler(
            popsize=64, nsteps=4 * NDIM, jax_loglike=_jax_loglike,
            seed=4, scale=0.3, mesh=mesh)
    else:
        s.stepsampler = FusedPopulationSliceSampler(
            popsize=64, nsteps=2 * NDIM, jax_loglike=_jax_loglike,
            seed=4, engine=engine, mesh=mesh)
    res = s.run(min_num_live_points=128, viz_callback=False,
                show_status=False, max_num_improvement_loops=0,
                min_ess=0, dlogz=1.0, frac_remain=0.05,
                region_class=SimpleRegion, cluster_num_live_points=0)
    assert getattr(s, '_segment_exits', None), \
        'sharded segment path never engaged'
    assert abs(res['logz']) < 4 * res['logzerr'] + 0.2, \
        (res['logz'], res['logzerr'])


@pytest.mark.slow
@pytest.mark.parametrize("engine", ['spec', 'async'])
def test_segment_engine_unbiased_over_seeds(engine):
    """Multi-seed bias audit of the segment paths.

    The mean standardized logZ deviation over N seeds must be within
    ~2/sqrt(N) of zero, and the online MWW insertion-rank test must
    converge for most runs (cf. the 10-seed on-chip audit in
    evaluate/bias_audit.py; reference oracle tests/test_run.py:311-315).
    """
    nseeds = 6
    zs, conv = [], 0
    for seed in range(1, nseeds + 1):
        res, _ = _run(seed=seed, engine=engine)
        zs.append(res['logz'] / res['logzerr'])
        conv += bool(res['insertion_order_MWW_test']['converged'])
    mean_z = float(np.mean(zs))
    assert abs(mean_z) < 2.0 / np.sqrt(nseeds) + 0.3, (zs, mean_z)
    assert conv >= nseeds - 1, 'MWW converged in only %d/%d runs' \
        % (conv, nseeds)


def test_rejection_segment_optin():
    """The opt-in fused-rejection segment path samples correctly."""
    def ll(t):
        return -0.5 * (((t - 0.5) / 0.1) ** 2).sum(axis=1)

    def jll(t):
        return -0.5 * (((t - 0.5) / 0.1) ** 2).sum(axis=1)

    s = ReactiveNestedSampler(['a', 'b', 'c'], ll,
                              transform=lambda x: np.asarray(x),
                              vectorized=True, seed=9, jax_loglike=jll,
                              ndraw_min=512, ndraw_max=2048)
    s.fused_sampler.segment_enabled = True
    res = s.run(min_num_live_points=128, viz_callback=False,
                show_status=False, max_num_improvement_loops=0,
                min_ess=0, dlogz=1.0, frac_remain=0.1)
    assert getattr(s, '_segment_exits', None), \
        'rejection segment path never engaged'
    # 3-d gaussian, sigma=0.1 in unit cube: logz = 3*log(0.1*sqrt(2pi))
    expected = 3 * np.log(0.1 * np.sqrt(2 * np.pi))
    assert abs(res['logz'] - expected) < 4 * res['logzerr'] + 0.2, \
        (res['logz'], expected, res['logzerr'])


def test_segment_logs_points_and_resumes(tmp_path):
    """Segment mode logs consumed points; a resume replays them."""
    calls = {'n': 0}

    def counting_loglike(t):
        calls['n'] += len(t)
        return _loglike(t)

    def make(resume):
        s = ReactiveNestedSampler(
            ['p%d' % i for i in range(NDIM)], counting_loglike,
            transform=lambda x: np.asarray(x), vectorized=True, seed=6,
            log_dir=str(tmp_path / 'run'), resume=resume)
        s.transform_layer_class = ScalingLayer
        s.stepsampler = FusedPopulationSliceSampler(
            popsize=64, nsteps=2 * NDIM, jax_loglike=_jax_loglike,
            seed=6, engine='spec')
        return s

    s1 = make('overwrite')
    r1 = s1.run(min_num_live_points=128, viz_callback=False,
                show_status=False, max_num_improvement_loops=0,
                min_ess=0, dlogz=1.0, frac_remain=0.05,
                region_class=SimpleRegion, cluster_num_live_points=0)
    assert getattr(s1, '_segment_exits', None), 'segments never engaged'
    stored = s1.pointstore.nrows
    assert stored > r1['niter'] // 2, \
        'segment mode logged too few points (%d of %d)' % (stored,
                                                           r1['niter'])
    s1.pointstore.close()

    host_calls_run1 = calls['n']
    calls['n'] = 0
    s2 = make('resume')
    r2 = s2.run(min_num_live_points=128, viz_callback=False,
                show_status=False, max_num_improvement_loops=0,
                min_ess=0, dlogz=1.0, frac_remain=0.05,
                region_class=SimpleRegion, cluster_num_live_points=0)
    tol = 3 * (r1['logzerr'] + r2['logzerr'])
    assert abs(r1['logz'] - r2['logz']) < tol, (r1['logz'], r2['logz'])
    # the replay must substitute almost all host-side sampling work
    # (the device evals are the jax twin; calls here are host-side
    # rechecks + prior sampling + any fresh sampling after the stack)
    assert calls['n'] < 0.5 * max(host_calls_run1, 1), \
        (calls['n'], host_calls_run1)


def test_interrupted_segment_resume_repays_nothing(tmp_path):
    """An interrupted segment run resumes past the interrupt for free.

    Segment mode logs the candidates the host did NOT insert (truncated
    accepted rows, _log_segment_leftovers): the resumed run consumes
    them from the store, so continuing beyond the interrupt point needs
    zero fresh device evaluations.
    """
    def make(resume):
        s = ReactiveNestedSampler(
            ['p%d' % i for i in range(NDIM)], _loglike,
            transform=lambda x: np.asarray(x), vectorized=True, seed=9,
            log_dir=str(tmp_path / 'irun'), resume=resume)
        s.transform_layer_class = ScalingLayer
        # spec_depth pinned: how far past the interrupt the leftover log
        # reaches depends on the final batch's harvest pattern, and this
        # test's interrupt+10 target was calibrated at depth 4
        s.stepsampler = FusedPopulationSliceSampler(
            popsize=64, nsteps=2 * NDIM, jax_loglike=_jax_loglike,
            seed=9, engine='spec', spec_depth=4)
        return s

    common = dict(min_num_live_points=128, viz_callback=False,
                  show_status=False, max_num_improvement_loops=0,
                  min_ess=0, dlogz=1.0, frac_remain=0.05,
                  region_class=SimpleRegion, cluster_num_live_points=0)
    s1 = make('overwrite')
    s1.run(max_iters=580, **common)
    assert getattr(s1, '_segment_exits', None), 'segments never engaged'
    stored = s1.pointstore.nrows
    s1.pointstore.close()
    assert stored > 580, 'leftover candidates were not logged'

    # resume PAST the interrupt point: served entirely from the store
    s2 = make('resume')
    s2.run(max_iters=590, **common)
    assert s2.stepsampler.ncalls == 0, \
        'resume re-paid %d device evaluations' % s2.stepsampler.ncalls
    s2.pointstore.close()


def test_segment_with_improvement_loops():
    """Reactive widening passes coexist with the segment fast path."""
    s = ReactiveNestedSampler(
        ['p%d' % i for i in range(NDIM)], _loglike,
        transform=lambda x: np.asarray(x), vectorized=True, seed=12)
    s.transform_layer_class = ScalingLayer
    s.stepsampler = FusedPopulationSliceSampler(
        popsize=64, nsteps=2 * NDIM, jax_loglike=_jax_loglike,
        seed=12, engine='spec')
    res = s.run(min_num_live_points=128, viz_callback=False,
                show_status=False, max_num_improvement_loops=1,
                min_ess=500, dlogz=1.0, frac_remain=0.05,
                region_class=SimpleRegion, cluster_num_live_points=0)
    assert res['ess'] > 400, res['ess']
    assert abs(res['logz']) < 4 * res['logzerr'] + 0.2, \
        (res['logz'], res['logzerr'])


def test_segment_plateau_handover():
    """A likelihood with plateaus falls back to the classic loop safely."""
    def plateau_ll(t):
        # heavily quantized likelihood: many exact duplicates
        base = -(((t - 0.5) / 0.2) ** 2).sum(axis=1)
        return np.round(base * 3) / 3.0

    def jax_plateau_ll(t):
        base = -(((t - 0.5) / 0.2) ** 2).sum(axis=1)
        return jnp.round(base * 3) / 3.0

    s = ReactiveNestedSampler(
        ['a', 'b'], plateau_ll, transform=lambda x: np.asarray(x),
        vectorized=True, seed=3)
    s.transform_layer_class = ScalingLayer
    s.stepsampler = FusedPopulationSliceSampler(
        popsize=32, nsteps=6, jax_loglike=jax_plateau_ll, seed=3,
        engine='spec')
    res = s.run(min_num_live_points=64, viz_callback=False,
                show_status=False, max_num_improvement_loops=0,
                min_ess=0, dlogz=2.0, frac_remain=0.5,
                region_class=SimpleRegion, cluster_num_live_points=0,
                max_ncalls=200000)
    assert np.isfinite(res['logz'])
