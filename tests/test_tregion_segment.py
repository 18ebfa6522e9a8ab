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
    # ...with the tregion filter actually fused into the kernels
    assert sampler.stepsampler._treg_key == (True, NDIM), \
        sampler.stepsampler._treg_key
    assert abs(res['logz'] - _true_logz()) < 3 * max(res['logzerr'], 0.5), \
        (res['logz'], _true_logz())


def test_treg_eval_filters_and_bills_correctly():
    """Kernel-level check: out-of-ellipsoid rows get -inf and no billing."""
    import jax.numpy as jnp

    from ultranest_tpu.mlfriends import WrappingEllipsoid

    rng = np.random.RandomState(0)
    pts = rng.normal(2.0, 0.1, size=(64, NDIM))
    tregion = WrappingEllipsoid(pts)
    tregion.enlarge = tregion.compute_enlargement(
        nbootstraps=5, rng=np.random.RandomState(1))
    tregion.create_ellipsoid()

    ss = FusedPopulationSliceSampler(
        popsize=4, nsteps=2, jax_loglike=lambda v: jnp.zeros(v.shape[0]),
        jax_transform=_transform)
    assert ss._sync_treg_key(tregion)
    ev = ss._treg_eval()
    treg = ss._pack_tregion(tregion)
    # u rows mapping inside (p ~ 2) and far outside (p ~ 8) the ellipsoid
    u = np.vstack([np.full((3, NDIM), np.sqrt(0.2)),
                   np.full((3, NDIM), np.sqrt(0.8))]).astype(np.float32)
    L, tin = map(np.asarray, ev(jnp.asarray(u), jnp.asarray(treg)))
    expected = tregion.inside(_transform(u.astype(float)))
    np.testing.assert_array_equal(tin, expected)
    assert tin[:3].all() and not tin[3:].any()
    assert np.isfinite(L[:3]).all()
    assert np.isneginf(L[3:]).all()


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
