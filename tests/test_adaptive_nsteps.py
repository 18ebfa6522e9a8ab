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


def test_reljump_target_values():
    """Chi-square GM of a decorrelated jump: sqrt(2) asymptote with the
    exact low-dimension Jensen correction."""
    from ultranest_tpu.popstepsampler import decorrelation_gm_target
    assert abs(decorrelation_gm_target(100) - np.sqrt(2)) < 0.01
    assert abs(decorrelation_gm_target(2)
               - np.sqrt(2) * np.exp(-0.5772156649 / 2)) < 1e-6
    # monotone in ndim
    t = [decorrelation_gm_target(d) for d in (1, 2, 5, 20, 100)]
    assert all(a < b for a, b in zip(t, t[1:]))


def test_reljump_gm_grows_nsteps_despite_saturated_far_frac():
    """The gauss-100d failure mode: every chain clears one cloud radius
    (far_frac 1.0) but endpoints still correlate with starts
    (gm below target) — the governor must keep doubling."""
    ss = _bare_sampler(adaptive_nsteps=True)
    # one low reading: could be post-growth scale warm-up, no action yet
    ss._adapt_nsteps(1.0, 64, 8, rel_jump_gm=1.26, gm_target=1.407)
    assert ss.nsteps == 8
    # second consecutive low reading: grow
    ss._adapt_nsteps(1.0, 64, 8, rel_jump_gm=1.26, gm_target=1.407)
    assert ss.nsteps == 16 and ss._nsteps_grew


def test_reljump_gm_satisfied_allows_steady_state():
    # 1.39/1.407 = 0.988: the measured unbiased nsteps=400 reading on
    # gauss100_hard (device-normalized)
    ss = _bare_sampler(adaptive_nsteps=True)
    for _ in range(4):
        ss._adapt_nsteps(1.0, 64, 8, rel_jump_gm=1.39, gm_target=1.407)
    assert ss.nsteps == 8


def test_reljump_biased_anchor_reading_grows():
    """gm/target = 0.931 — the measured nsteps=200 reading on
    gauss100_hard, where logZ is still +2.8 biased — must grow."""
    ss = _bare_sampler(adaptive_nsteps=True)
    ss._adapt_nsteps(1.0, 64, 8, rel_jump_gm=1.31, gm_target=1.407)
    ss._adapt_nsteps(1.0, 64, 8, rel_jump_gm=1.31, gm_target=1.407)
    assert ss.nsteps == 16


def test_reljump_low_streak_reset_by_good_dispatch():
    """Alternating low/high readings never accumulate to a doubling."""
    ss = _bare_sampler(adaptive_nsteps=True)
    for _ in range(3):
        ss._adapt_nsteps(1.0, 64, 8, rel_jump_gm=1.26, gm_target=1.407)
        ss._adapt_nsteps(1.0, 64, 8, rel_jump_gm=1.39, gm_target=1.407)
    assert ss.nsteps == 8


def test_reljump_grace_after_growth():
    """Post-growth dispatches run with a stale slice scale: two low
    readings inside the grace window must not re-double (measured
    overshoot to nsteps=800 instead of 400 on gauss100_hard)."""
    ss = _bare_sampler(adaptive_nsteps=True)
    ss._adapt_nsteps(1.0, 64, 8, rel_jump_gm=1.2, gm_target=1.407)
    ss._adapt_nsteps(1.0, 64, 8, rel_jump_gm=1.2, gm_target=1.407)
    assert ss.nsteps == 16 and ss._gm_grace == 2
    # two low warm-up readings at the new nsteps: consumed by grace
    ss._adapt_nsteps(1.0, 64, 16, rel_jump_gm=1.2, gm_target=1.407)
    ss._adapt_nsteps(1.0, 64, 16, rel_jump_gm=1.2, gm_target=1.407)
    assert ss.nsteps == 16
    # persistently low AFTER grace: genuinely too short, grows
    ss._adapt_nsteps(1.0, 64, 16, rel_jump_gm=1.2, gm_target=1.407)
    ss._adapt_nsteps(1.0, 64, 16, rel_jump_gm=1.2, gm_target=1.407)
    assert ss.nsteps == 32


def test_reljump_gm_blocks_shrink_when_marginal():
    """far_frac > 0.9 alone must not shrink while the GM criterion is
    unmet (oscillation guard)."""
    ss = _bare_sampler(adaptive_nsteps=True, nsteps=16)
    ss.nsteps_min = 8
    ss.max_nsteps = 16  # growth capped: only the shrink branch reachable
    ss._adapt_nsteps(0.95, 64, 16, rel_jump_gm=1.20, gm_target=1.407)
    assert ss.nsteps == 16


def test_reljump_gm_ignored_for_ball_radius_regions():
    """MLFriends ball normalizer keeps the reference far-frac semantics:
    gm_target None -> far_frac alone decides."""
    ss = _bare_sampler(adaptive_nsteps=True, nsteps=16)
    ss.nsteps_min = 8
    ss._adapt_nsteps(0.95, 64, 16, rel_jump_gm=0.7, gm_target=None)
    assert ss.nsteps < 16  # shrank: far_frac 0.95 is all that counts


def test_mww_signal_noop_when_not_adaptive():
    ss = _bare_sampler(adaptive_nsteps=False)
    ss.observe_insertion_ranks(np.full(2048, 399), 400)
    assert ss.nsteps == 8 and ss._mww_acc.N == 0


@pytest.mark.slow
def test_governor_reaches_decorrelation_target_high_dim():
    """High-dimension analogue of the gauss100_hard certification
    (evaluate/bias_audit.py): far-enough saturates early but the
    GM-relative-jump criterion keeps doubling until endpoints
    decorrelate, and logZ comes out unbiased."""
    from ultranest_tpu.popstepsampler import decorrelation_gm_target
    prob = models.gauss(ndim=24, sigma=0.02)
    sampler = ReactiveNestedSampler(seed=7,
                                    **prob.sampler_kwargs(use_jax=False))
    sampler.transform_layer_class = ScalingLayer
    ss = FusedPopulationSliceSampler(
        popsize=256, nsteps=4, jax_loglike=prob.jax_loglike,
        seed=7, engine='spec', adaptive_nsteps=True)
    sampler.stepsampler = ss
    res = sampler.run(min_num_live_points=200, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.1,
                      region_class=SimpleRegion,
                      cluster_num_live_points=0)
    assert ss.nsteps > 4
    arr = np.asarray(ss.logstat, float)
    lab = ss.logstat_labels
    cur = arr[:, lab.index('nsteps')] == ss.nsteps
    gm = np.nanmean(arr[cur, lab.index('mean_rel_jump')])
    target = decorrelation_gm_target(24)
    assert gm >= 0.9 * ss.RELJUMP_MARGIN * target, (gm, target)
    assert abs(res['logz'] - prob.logz) < 3 * max(res['logzerr'], 0.5), \
        (res['logz'], res['logzerr'], prob.logz, ss.nsteps)


def test_prewarm_compiles_doubled_kernel_in_background():
    """Segment launches speculatively compile the 2x-nsteps kernel.

    Growth events are always exact doublings, so the doubled segment
    kernel can be built while the run proceeds; the growth event must
    find it in the shared kernel cache instead of blocking in XLA.
    """
    prob = models.asymgauss(ndim=6, sigma_min=0.05)
    res, ss = _run(prob, dict(nsteps=2, adaptive_nsteps=True,
                              max_nsteps=64))
    assert ss._seg_prewarm, 'no prewarm was ever scheduled'
    for th in ss._seg_prewarm.values():
        if th is not None:
            th.join(timeout=60)
            assert not th.is_alive()
    # the deepest nsteps the governor reached had its kernel prewarmed
    # before the growth event needed it (early doublings may happen in
    # classic mode, before any segment launch could schedule a prewarm)
    visited = {int(r[3]) for r in ss.logstat}
    warmed = {ck[3] for ck in ss._seg_prewarm}
    assert max(visited) in warmed, (visited, warmed)
    assert abs(res['logz'] - prob.logz) < 3 * max(res['logzerr'], 0.7)


def test_prewarm_not_scheduled_when_not_adaptive():
    prob = models.asymgauss(ndim=6, sigma_min=0.05)
    _, ss = _run(prob, dict(nsteps=4))
    assert ss._seg_prewarm == {}
