import numpy as np
import pytest

from ultranest_tpu.mlfriends import (AffineLayer, LocalAffineLayer,
                                     MaxPrincipleGapAffineLayer, MLFriends,
                                     RobustEllipsoidRegion, ScalingLayer,
                                     SimpleRegion, WrappingEllipsoid,
                                     bounding_ellipsoid, update_clusters)
from ultranest_tpu.ops.pairwise import (compute_maxradiussq,
                                        compute_mean_pair_distance,
                                        count_nearby, find_nearby,
                                        subtract_nearby)


def test_maxradius_simple():
    a = np.array([[0.0, 0.0], [1.0, 0.0]])
    b = np.array([[0.0, 0.5], [3.0, 0.0]])
    # nearest sq distances: 0.25 and 4 -> max 4
    assert np.isclose(compute_maxradiussq(a, b), 4.0, rtol=1e-5)


def test_maxradius_matches_bruteforce():
    rng = np.random.RandomState(0)
    for ndim in (2, 7):
        a = rng.uniform(size=(100, ndim))
        b = rng.uniform(size=(73, ndim))
        d2 = ((a[:, None, :] - b[None, :, :])**2).sum(axis=2)
        expected = d2.min(axis=0).max()
        got = compute_maxradiussq(a, b)
        assert np.isclose(got, expected, rtol=1e-4), (got, expected)


def test_count_and_find_nearby():
    rng = np.random.RandomState(1)
    a = rng.uniform(size=(50, 3))
    b = rng.uniform(size=(40, 3))
    r2 = 0.1
    d2 = ((a[:, None, :] - b[None, :, :])**2).sum(axis=2)
    expected_counts = (d2 <= r2).sum(axis=0)
    counts = count_nearby(a, b, r2)
    np.testing.assert_array_equal(counts, expected_counts)

    idx = find_nearby(a, b, r2)
    for j in range(len(b)):
        hits = np.where(d2[:, j] <= r2)[0]
        if len(hits) == 0:
            assert idx[j] == -1
        else:
            assert idx[j] == hits[0]


def test_subtract_nearby():
    rng = np.random.RandomState(2)
    pts = rng.uniform(size=(30, 2))
    r2 = 0.05
    out = subtract_nearby(pts, r2)
    d2 = ((pts[:, None, :] - pts[None, :, :])**2).sum(axis=2)
    for j in range(len(pts)):
        near = d2[j] <= r2
        expected = pts[j] - pts[near].mean(axis=0)
        np.testing.assert_allclose(out[j], expected, atol=1e-5)


def test_mean_pair_distance():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    cids = np.array([1, 1, 1])
    # pairs: (0,1)=1, (0,2)=1, (1,2)=sqrt(2)
    expected = (1 + 1 + np.sqrt(2)) / 3
    assert np.isclose(compute_mean_pair_distance(pts, cids), expected, rtol=1e-5)
    # cluster 0 points excluded entirely
    cids2 = np.array([1, 1, 0])
    assert np.isclose(compute_mean_pair_distance(pts, cids2), 1.0, rtol=1e-5)


def test_update_clusters_two_blobs():
    rng = np.random.RandomState(3)
    a = rng.normal(0.2, 0.01, size=(50, 2))
    b = rng.normal(0.8, 0.01, size=(50, 2))
    pts = np.vstack((a, b))
    nclusters, cids, overlapped = update_clusters(pts, pts, 0.01)
    assert nclusters == 2
    assert len(np.unique(cids[:50])) == 1
    assert len(np.unique(cids[50:])) == 1
    assert cids.min() == 1
    # overlapped points are centered per cluster
    assert np.abs(overlapped.mean(axis=0)).max() < 0.01
    # id reuse: relabeling with previous assignment keeps ids
    nclusters2, cids2, _ = update_clusters(pts, pts, 0.01, cids)
    np.testing.assert_array_equal(cids, cids2)


def test_update_clusters_single():
    rng = np.random.RandomState(4)
    pts = rng.uniform(size=(60, 2))
    nclusters, cids, overlapped = update_clusters(pts, pts, 10.0)
    assert nclusters == 1
    assert (cids == 1).all()
    np.testing.assert_array_equal(overlapped, pts)


def test_update_clusters_radius_sentinel():
    # ellipsoid-only regions pass maxradiussq=1e300 (or None): everything
    # is one cluster and the O(N^2) graph is skipped entirely
    rng = np.random.RandomState(5)
    pts = rng.uniform(size=(80, 3))
    for radius in (1e300, None):
        nclusters, cids, overlapped = update_clusters(pts, pts, radius)
        assert nclusters == 1
        assert (cids == 1).all()
        np.testing.assert_array_equal(overlapped, pts)


def _make_region(npts=100, ndim=2, seed=0, cls=MLFriends, layer=AffineLayer):
    rng = np.random.RandomState(seed)
    u = rng.uniform(0.3, 0.7, size=(npts, ndim))
    tl = layer()
    tl.optimize(u, u)
    region = cls(u, tl)
    maxd, enlarge = region.compute_enlargement(
        nbootstraps=10, rng=np.random.RandomState(seed))
    region.maxradiussq = maxd
    region.enlarge = enlarge
    region.create_ellipsoid()
    return region, rng


@pytest.mark.parametrize("layer", [ScalingLayer, AffineLayer,
                                   LocalAffineLayer,
                                   MaxPrincipleGapAffineLayer])
def test_layer_roundtrip(layer):
    rng = np.random.RandomState(5)
    u = rng.uniform(0.2, 0.8, size=(80, 3))
    tl = layer()
    tl.optimize(u, u - u.mean(axis=0))
    t = tl.transform(u)
    u2 = tl.untransform(t)
    np.testing.assert_allclose(u, u2, atol=1e-10)
    assert np.isfinite(tl.logvolscale)


@pytest.mark.parametrize("layer", [ScalingLayer, AffineLayer, LocalAffineLayer])
def test_layer_create_new(layer):
    region, rng = _make_region(layer=layer)
    tl2 = region.transformLayer.create_new(region.u, region.maxradiussq)
    assert tl2.nclusters >= 1
    assert not (tl2.clusterids == 0).any()
    t = tl2.transform(region.u)
    np.testing.assert_allclose(tl2.untransform(t), region.u, atol=1e-8)


def test_mlfriends_live_points_inside():
    region, rng = _make_region()
    assert region.inside(region.u).all()


def test_mlfriends_sampling_methods_agree():
    """All sampling methods must draw from the same region."""
    region, rng = _make_region(npts=200, seed=1)
    results = {}
    for method in region.sampling_methods:
        pts = []
        for _ in range(20):
            s = method(nsamples=200, rng=rng)
            if len(s):
                pts.append(s)
        pts = np.vstack(pts)
        assert region.inside(pts).mean() > 0.98, method.__name__
        results[method.__name__] = pts.mean(axis=0)
    means = np.array(list(results.values()))
    assert means.std(axis=0).max() < 0.03, results


def test_robust_ellipsoid_region():
    region, rng = _make_region(npts=120, ndim=4, cls=RobustEllipsoidRegion)
    assert region.inside(region.u).all()
    s = region.sample(nsamples=100, rng=rng)
    if len(s):
        assert region.inside(s).all()
    assert np.isfinite(region.estimate_volume())


def test_simple_region():
    region, rng = _make_region(npts=120, ndim=4, cls=SimpleRegion)
    assert region.inside(region.u).all()
    s = region.sample(nsamples=100, rng=rng)
    if len(s):
        assert region.inside(s).all()


def test_too_few_points_raises():
    rng = np.random.RandomState(0)
    u = rng.uniform(0.4, 0.6, size=(5, 5))
    tl = ScalingLayer()
    tl.optimize(u, u)
    region = RobustEllipsoidRegion(u, tl)
    with pytest.raises(FloatingPointError):
        region.compute_enlargement(nbootstraps=5)


def test_wrapping_ellipsoid():
    rng = np.random.RandomState(6)
    u = rng.uniform(0.3, 0.7, size=(100, 3))
    ell = WrappingEllipsoid(u)
    f = ell.compute_enlargement(nbootstraps=10, rng=rng)
    assert f > 0
    ell.enlarge = f
    ell.create_ellipsoid()
    assert ell.inside(u).all()
    far = np.ones((1, 3)) * 5
    assert not ell.inside(far).any()


def test_wrapping_ellipsoid_fixed_dim():
    rng = np.random.RandomState(7)
    u = rng.uniform(0.3, 0.7, size=(50, 3))
    u[:, 1] = 0.5
    ell = WrappingEllipsoid(u)
    f = ell.compute_enlargement(nbootstraps=10, rng=rng)
    ell.enlarge = f
    ell.create_ellipsoid()
    assert ell.inside(u).all()
    moved = u.copy()
    moved[:, 1] = 0.51
    assert not ell.inside(moved).any()


def test_bounding_ellipsoid():
    rng = np.random.RandomState(8)
    x = rng.uniform(size=(500, 2))
    ctr, cov = bounding_ellipsoid(x)
    np.testing.assert_allclose(ctr, x.mean(axis=0))
    assert cov.shape == (2, 2)
    # (d+2) inflation of the sample covariance
    np.testing.assert_allclose(cov, np.cov(x - ctr, rowvar=0) * 4)


def test_region_bootstrap_radius_shrinks_with_more_points():
    r_small, _ = _make_region(npts=50, seed=3)
    r_large, _ = _make_region(npts=800, seed=3)
    assert r_large.maxradiussq < r_small.maxradiussq


def test_wrapped_dims():
    rng = np.random.RandomState(9)
    # points wrapped around the 0/1 boundary in axis 0
    u = rng.uniform(0.4, 0.6, size=(80, 2))
    u[:, 0] = np.fmod(u[:, 0] + 0.9, 1.0)
    tl = ScalingLayer(wrapped_dims=[0])
    tl.optimize(u, u)
    t = tl.transform(u)
    u2 = tl.untransform(t)
    np.testing.assert_allclose(u, u2, atol=1e-10)
    # wrapped coordinates form one compact blob in t-space
    assert t[:, 0].std() < 1.5


def test_label_propagation_matches_csgraph():
    # the fully on-device pointer-jumping component labeller must agree
    # with the scipy csgraph path for random geometries
    from ultranest_tpu.ops.cluster import (connected_components,
                                           label_propagation_components)
    rng = np.random.RandomState(11)
    for trial in range(5):
        nblobs = rng.randint(1, 5)
        pts = np.concatenate([
            rng.normal(c, 0.02, size=(rng.randint(5, 30), 2))
            for c in rng.uniform(0, 10, size=(nblobs, 2))])
        for r2 in (0.01, 0.5, 200.0):
            a = np.asarray(connected_components(pts, r2))
            b = np.asarray(label_propagation_components(pts, r2))
            np.testing.assert_array_equal(a, b)


def test_bootstrap_enlargement_moment_form_matches_naive():
    """The BLAS moment-form enlargement equals the direct residual form.

    Guards the matmul rewrite of ``_bootstrap_enlargement`` (variance and
    covariance via E[x^2]-E[x]^2 / sum xx^T - n c c^T): compares against a
    straightforward per-round implementation, including a tight cluster
    far from the origin where the moment form is most cancellation-prone.
    """
    from ultranest_tpu.ops.bootstrap import _bootstrap_enlargement

    def naive(u, masks, mode):
        u = np.asarray(u, dtype=np.float64)
        ndim = u.shape[1]
        best = -np.inf
        for sel in masks:
            us = u[sel]
            ctr = us.mean(axis=0)
            delta = u[~sel] - ctr
            if mode == 'simple':
                var = np.maximum(((us - ctr) ** 2).mean(axis=0), 1e-300)
                m = (delta ** 2 / var).sum(axis=1)
            else:
                cov = np.cov(us, rowvar=False, ddof=1) * (ndim + 2)
                m = np.einsum('ni,ij,nj->n', delta, np.linalg.inv(cov),
                              delta)
            if m.size:
                best = max(best, m.max())
        return best

    rng = np.random.RandomState(42)
    for n, d, scale, off in [(80, 5, 1.0, 0.0), (120, 12, 1e-5, 0.999),
                             (60, 3, 1e-2, 0.5)]:
        u = rng.rand(n, d) * scale + off
        masks = np.zeros((12, n), bool)
        for b in range(12):
            masks[b, rng.choice(n, n)] = True
        masks[:, 0] = False   # ensure every round has unselected points
        for mode in ('simple', 'mlfriends'):
            expected = naive(u, masks, mode)
            got = _bootstrap_enlargement(u, masks, mode)
            assert got == pytest.approx(expected, rel=1e-8), (mode, d)


def test_bootstrap_enlargement_degenerate_axis_stays_finite():
    """A zero-variance bootstrap axis must enlarge hugely, not NaN.

    With the old 1e-300 variance floor, ivar ~1e300 made both matmul
    terms of the simple-mode moment expansion overflow to inf and
    inf - inf = NaN, which the caller's isfinite check turned into
    'silently keep the stale region'. The 1e-30 floor keeps the result
    huge but finite — degrading the same way the residual form did.
    """
    from ultranest_tpu.ops.bootstrap import _bootstrap_enlargement

    rng = np.random.RandomState(7)
    n = 40
    u = rng.rand(n, 3)
    u[:, 1] = 0.5            # one exactly degenerate axis
    masks = np.zeros((6, n), bool)
    for b in range(6):
        masks[b, rng.choice(n, n)] = True
    masks[:, 0] = False
    got = _bootstrap_enlargement(u, masks, 'simple')
    assert np.isfinite(got)
    assert got > 0


def test_numpy_radius_matches_round_loop():
    """KNN-table bootstrap radius is bit-identical to the per-round loop.

    The host fallback of `_bootstrap_radius` (taken when JAX_PLATFORMS
    pins the accelerator only) answers every bootstrap round from one
    shared K-nearest-neighbour table; this property-checks it against
    the direct `d2[sel][:, ~sel].min(axis=0).max()` definition across
    sizes, duplicate points, and K settings including the rare-miss
    fallback (K=1 forces misses).
    """
    from ultranest_tpu.ops.bootstrap import _numpy_radius, make_bootstrap_masks
    from ultranest_tpu.ops.pairwise import _np_sqdist

    rng = np.random.RandomState(42)
    for trial in range(25):
        n = rng.randint(2, 300)
        d = rng.randint(1, 12)
        pts = rng.rand(n, d).astype(np.float32)
        if trial % 3 == 0:
            half = n // 2
            pts[:half] = pts[half:2 * half][:half]
        masks = make_bootstrap_masks(n, rng.randint(1, 35), rng=rng)
        d2 = _np_sqdist(pts, pts)
        expected = 0.0
        for sel in masks:
            out = d2[sel][:, ~sel].min(axis=0)
            if out.size:
                expected = max(expected, float(out.max()))
        for K in (1, 8, n + 5):
            assert _numpy_radius(pts, masks, K=K) == expected
