"""nsteps governance for the device population engines.

The reference protects users from too-short chains with the
jump-distance criterion + adaptive nsteps
(/root/reference/ultranest/stepsampler.py:381-448,889-923). The fused
device engines mirror that: per-dispatch far-enough fractions feed a
doubling governor (``adaptive_nsteps=True``), and a fixed-nsteps run
whose chains never decorrelate ends with a loud warning naming nsteps.
"""
import warnings

import numpy as np
import pytest

from ultranest_tpu import ReactiveNestedSampler, models
from ultranest_tpu.mlfriends import ScalingLayer, SimpleRegion
from ultranest_tpu.popfused import FusedPopulationSliceSampler


def _run(prob, sampler_kw, seed=11, **run_kw):
    sampler = ReactiveNestedSampler(seed=seed,
                                    **prob.sampler_kwargs(use_jax=False))
    sampler.transform_layer_class = ScalingLayer
    sampler.stepsampler = FusedPopulationSliceSampler(
        popsize=128, jax_loglike=prob.jax_loglike,
        jax_transform=getattr(prob, 'jax_transform', None),
        seed=seed, engine='spec', **sampler_kw)
    opts = dict(min_num_live_points=200, viz_callback=False,
                show_status=False, max_num_improvement_loops=0,
                min_ess=0, dlogz=2.0, frac_remain=0.1,
                region_class=SimpleRegion, cluster_num_live_points=0)
    opts.update(run_kw)
    res = sampler.run(**opts)
    return res, sampler.stepsampler


def test_adaptive_nsteps_grows_and_converges():
    """Starting from absurdly short chains, the governor doubles its way
    to a decorrelating nsteps and logZ comes out right."""
    prob = models.asymgauss(ndim=12, sigma_min=0.02)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)  # must NOT warn
        res, ss = _run(prob, dict(nsteps=1, adaptive_nsteps=True))
    assert ss.nsteps > 1, 'governor never engaged'
    info = ss.get_info_dict()
    assert np.isfinite(info['mean_nsteps'])
    # judged at the final nsteps the chains decorrelate
    arr = np.asarray(ss.logstat, float)
    cur = arr[:, ss.logstat_labels.index('nsteps')] == ss.nsteps
    frac = np.nanmean(arr[cur, ss.logstat_labels.index('far_enough')])
    assert frac >= 0.5, (ss.nsteps, frac)
    assert abs(res['logz'] - prob.logz) < 3 * max(res['logzerr'], 0.7), \
        (res['logz'], res['logzerr'], prob.logz)


def test_fixed_short_nsteps_warns_loudly():
    """A fixed too-short nsteps must end with a diagnostic naming nsteps."""
    prob = models.asymgauss(ndim=12, sigma_min=0.02)
    with pytest.warns(UserWarning, match='nsteps=1'):
        _run(prob, dict(nsteps=1), seed=12)


def test_segment_mode_populates_jump_diagnostics():
    """Segment-path dispatches log jump-distance rows like classic mode."""
    prob = models.gauss(ndim=4, sigma=0.05)
    res, ss = _run(prob, dict(nsteps=8), seed=13)
    assert len(ss.logstat) > 0
    i_far = ss.logstat_labels.index('far_enough')
    i_n = ss.logstat_labels.index('nsteps')
    arr = np.asarray(ss.logstat, float)
    assert np.isfinite(arr[:, i_far]).all()
    assert (arr[:, i_n] == 8).all()
    assert ss.get_info_dict()['frac_far_enough'] > 0.5
    assert abs(res['logz'] - prob.logz) < 1.0


def test_adaptation_capped_by_max_nsteps():
    prob = models.gauss(ndim=4, sigma=0.05)
    res, ss = _run(prob, dict(nsteps=1, adaptive_nsteps=True, max_nsteps=4),
                   seed=14)
    assert ss.nsteps <= 4


def _bare_sampler(**kw):
    import jax.numpy as jnp
    kw.setdefault('popsize', 64)
    kw.setdefault('nsteps', 8)
    return FusedPopulationSliceSampler(
        jax_loglike=lambda u: -jnp.sum(u * u, axis=1), **kw)


def test_mww_signal_doubles_nsteps_on_biased_ranks():
    """Top-heavy insertion ranks must grow nsteps even when the
    jump-distance criterion would be satisfied (the gauss-100d
    sigma=0.01 failure mode)."""
    ss = _bare_sampler(adaptive_nsteps=True)
    nlive = 400
    # all insertions at the very top of the live ranks: maximal bias
    biased = np.full(128, nlive - 1)
    for _ in range(ss._mww_window // len(biased) + 1):
        ss.observe_insertion_ranks(biased, nlive, rec_nsteps=ss.nsteps)
        if ss.nsteps > 8:
            break
    assert ss.nsteps == 16
    assert ss._nsteps_grew  # blocks later shrink, like far-frac growth


def test_mww_signal_quiet_on_uniform_ranks():
    ss = _bare_sampler(adaptive_nsteps=True)
    nlive = 400
    rng = np.random.RandomState(5)
    for _ in range(6):  # several full windows
        ss.observe_insertion_ranks(
            rng.randint(0, nlive, size=ss._mww_window), nlive,
            rec_nsteps=ss.nsteps)
    assert ss.nsteps == 8


def test_mww_signal_ignores_stale_records():
    """Rows from dispatches launched at a previous nsteps must not
    re-fire the alarm after a growth event."""
    ss = _bare_sampler(adaptive_nsteps=True)
    nlive = 400
    biased = np.full(ss._mww_window, nlive - 1)
    ss.observe_insertion_ranks(biased, nlive, rec_nsteps=4)  # stale
    assert ss.nsteps == 8 and ss._mww_acc.N == 0
    ss.observe_insertion_ranks(biased, nlive, rec_nsteps=8)
    assert ss.nsteps == 16
    # queued stale batch from before the growth: ignored
    ss.observe_insertion_ranks(biased, nlive, rec_nsteps=8)
    assert ss.nsteps == 16


def test_mww_signal_noop_when_not_adaptive():
    ss = _bare_sampler(adaptive_nsteps=False)
    ss.observe_insertion_ranks(np.full(2048, 399), 400)
    assert ss.nsteps == 8 and ss._mww_acc.N == 0
