"""Golden clustering regressions: mode counting on known configurations.

Mirrors the reference's golden-file clustering tests
(tests/test_clustering.py with overclustered_*.npz / eggboxregion.txt):
cluster detection must find exactly the generated modes, without
fragmenting them.
"""
import numpy as np

from ultranest_tpu.mlfriends import (AffineLayer, LocalAffineLayer,
                                     MLFriends, update_clusters)
from ultranest_tpu.ops.bootstrap import (bootstrap_radius_enlargement,
                                         make_bootstrap_masks)


def eggbox_modes(rng, npts_per_mode=25, width=0.006):
    """Live points concentrated at the 9 interior eggbox maxima."""
    centers = []
    for i in range(3):
        for j in range(3):
            centers.append([(2 * i + 1) * 0.2 - 0.04, (2 * j + 1) * 0.2])
    pts = []
    for c in centers:
        pts.append(rng.normal(c, width, size=(npts_per_mode, 2)))
    return np.clip(np.vstack(pts), 1e-3, 1 - 1e-3), len(centers)


def build_region(u, layer_class=AffineLayer, seed=0):
    layer = layer_class()
    layer.optimize(u, u)
    region = MLFriends(u, layer)
    masks = make_bootstrap_masks(len(u), 30, rng=np.random.RandomState(seed))
    maxd, maxf, ok = bootstrap_radius_enlargement(u, region.unormed, masks)
    assert ok
    region.maxradiussq = maxd
    region.enlarge = maxf
    region.create_ellipsoid()
    return region


def test_eggbox_modes_are_separated():
    rng = np.random.RandomState(1)
    u, nmodes = eggbox_modes(rng)
    region = build_region(u)
    nclusters, cids, overlapped = update_clusters(
        u, region.unormed, region.maxradiussq)
    assert nclusters == nmodes, nclusters
    # every cluster is one mode: members agree on the nearest center
    for ci in range(1, nclusters + 1):
        members = u[cids == ci]
        assert members.std(axis=0).max() < 0.05


def test_overclustering_does_not_happen():
    """A single gaussian blob must remain one cluster after whitening."""
    rng = np.random.RandomState(2)
    u = rng.normal(0.5, 0.05, size=(200, 2)).clip(1e-3, 1 - 1e-3)
    region = build_region(u)
    nclusters, cids, _ = update_clusters(u, region.unormed,
                                         region.maxradiussq)
    assert nclusters == 1, nclusters


def test_elongated_single_cluster():
    """A strongly correlated blob stays one cluster (whitening works)."""
    rng = np.random.RandomState(3)
    z = rng.normal(size=(200, 2)) * [0.15, 0.002]
    theta = 0.7
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    u = (z @ rot.T + 0.5).clip(1e-3, 1 - 1e-3)
    region = build_region(u)
    nclusters, cids, _ = update_clusters(u, region.unormed,
                                         region.maxradiussq)
    assert nclusters == 1, nclusters


def test_cluster_ids_stable_between_rebuilds():
    """Cluster ids persist across relabeling with previous assignments."""
    rng = np.random.RandomState(4)
    u, nmodes = eggbox_modes(rng)
    region = build_region(u, layer_class=LocalAffineLayer)
    n1, cids1, _ = update_clusters(u, region.unormed, region.maxradiussq)
    # perturb points slightly and re-cluster with the previous ids
    u2 = np.clip(u + rng.normal(0, 1e-4, size=u.shape), 1e-3, 1 - 1e-3)
    region2 = build_region(u2, layer_class=LocalAffineLayer, seed=5)
    n2, cids2, _ = update_clusters(u2, region2.unormed,
                                   region2.maxradiussq, cids1)
    assert n1 == n2 == nmodes
    # id continuity: the dominant mapping is the identity
    agree = (cids1 == cids2).mean()
    assert agree > 0.95, agree
