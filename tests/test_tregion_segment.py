"""Non-affine transforms keep the device fast paths (tregion fusion).

The reference filters step-sampler proposals through a p-space
WrappingEllipsoid for non-affine transforms
(/root/reference/ultranest/integrator.py:2135-2157, one Mahalanobis
form per candidate). Here that filter is fused into the device kernels,
so `_segment_eligible` no longer bails when a tregion exists.
"""
import numpy as np

from ultranest_tpu import ReactiveNestedSampler
from ultranest_tpu.popfused import FusedPopulationSliceSampler

NDIM = 2
SIGMA = 0.05


def _transform(x):
    return 10.0 * x ** 2


def _loglike(p):
    return -0.5 * (((p - 2.0) / SIGMA) ** 2).sum(axis=1)


def _true_logz():
    x = (np.arange(200000) + 0.5) / 200000
    li = -0.5 * ((10.0 * x ** 2 - 2.0) / SIGMA) ** 2
    m = li.max()
    return NDIM * float(np.log(np.exp(li - m).mean()) + m)


def _names():
    return ['p%d' % i for i in range(NDIM)]


def test_popfused_segment_runs_with_tregion():
    """Curved transform: segment engine engages AND logZ is right."""
    sampler = ReactiveNestedSampler(
        _names(), _loglike, transform=_transform, vectorized=True, seed=3)
    sampler.stepsampler = FusedPopulationSliceSampler(
        popsize=64, nsteps=8, jax_loglike=_loglike,
        jax_transform=_transform, seed=3)
    res = sampler.run(min_num_live_points=100, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.1)
    # the transform is non-affine, so a tregion was built...
    assert sampler.build_tregion
    assert sampler.tregion is not None
    # ...and the segment fast path still engaged
    exits = getattr(sampler, '_segment_exits', None)
    assert exits and sum(exits.values()) > 0, exits
    assert abs(res['logz'] - _true_logz()) < 3 * max(res['logzerr'], 0.5), \
        (res['logz'], _true_logz())


def test_fused_rejection_runs_with_tregion():
    """Curved transform on the fused rejection path, segments forced on."""
    sampler = ReactiveNestedSampler(
        _names(), _loglike, transform=_transform, vectorized=True, seed=5,
        jax_loglike=_loglike, jax_transform=_transform)
    sampler.fused_sampler.segment_enabled = True
    res = sampler.run(min_num_live_points=100, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.1)
    assert sampler.tregion is not None
    exits = getattr(sampler, '_segment_exits', None)
    assert exits and sum(exits.values()) > 0, exits
    assert abs(res['logz'] - _true_logz()) < 3 * max(res['logzerr'], 0.5), \
        (res['logz'], _true_logz())


def test_classic_popfused_with_tregion_matches():
    """Classic (non-segment) popfused path with the tregion filter."""
    sampler = ReactiveNestedSampler(
        _names(), _loglike, transform=_transform, vectorized=True, seed=7)
    ss = FusedPopulationSliceSampler(
        popsize=64, nsteps=8, jax_loglike=_loglike,
        jax_transform=_transform, seed=7)
    ss.segment_capable = False
    sampler.stepsampler = ss
    res = sampler.run(min_num_live_points=100, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.1)
    assert abs(res['logz'] - _true_logz()) < 3 * max(res['logzerr'], 0.5), \
        (res['logz'], _true_logz())
