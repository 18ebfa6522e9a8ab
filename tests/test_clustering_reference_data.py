"""Clustering regressions on the reference's golden datasets.

Loads the real-world clustering failure cases vendored from the
reference into ``tests/data/`` (`overclustered_*.npz`,
`eggboxregion.txt`, `clusters2.txt` — cf. reference
tests/test_clustering.py) and asserts the historically expected
cluster structure. These datasets encode pathologies synthetic blobs
cannot reproduce (eggbox mode shredding, near-touching filaments).
The fixtures are pure measurement data (point coordinates), committed
in-tree so the regression gates run without a reference checkout.
"""
import os

import numpy as np

from ultranest_tpu.mlfriends import (AffineLayer, MLFriends, ScalingLayer,
                                     update_clusters)
from ultranest_tpu.integrator import ReactiveNestedSampler
from ultranest_tpu.utils import create_logger

REF_TESTS = os.path.join(os.path.dirname(__file__), 'data')


def test_eggboxregion_radius_and_modes():
    """18 eggbox modes must stay separate under 10 different RNG seeds."""
    points = np.loadtxt(os.path.join(REF_TESTS, 'eggboxregion.txt'))
    layer = ScalingLayer()
    layer.optimize(points, points)
    for seed in range(10):
        rng = np.random.RandomState(seed)
        region = MLFriends(points, layer)
        maxr = region.compute_maxradiussq(nbootstraps=30, rng=rng)
        assert 1e-10 < maxr < 6e-10, (seed, maxr)
        nclusters, clusteridxs, _ = update_clusters(points, points, maxr)
    assert 14 < nclusters < 20, nclusters


def test_overclustered_txt_cases():
    """Historical over-clustering cases: mode count must stay in range."""
    np.random.seed(1)
    for case in [20, 23, 24, 27, 49]:
        points = np.loadtxt(
            os.path.join(REF_TESTS, 'overclustered_u_%d.txt' % case))
        layer = ScalingLayer(wrapped_dims=[])
        layer.optimize(points, points)
        region = MLFriends(points, layer)
        maxr = region.compute_maxradiussq(nbootstraps=30)
        for _ in range(3):
            nclusters, _, _ = update_clusters(points, points, maxr)
            assert 14 < nclusters < 20, (case, nclusters)


def test_clusters2_case():
    """Two-filament case: clustering must find a handful of modes, not N."""
    points = np.loadtxt(os.path.join(REF_TESTS, 'clusters2.txt'))
    maxr = float(np.loadtxt(os.path.join(REF_TESTS, 'clusters2_radius.txt')))
    nclusters, clusteridxs, _ = update_clusters(points, points, maxr)
    assert 1 <= nclusters < 10, nclusters
    assert len(clusteridxs) == len(points)


class _BareSampler(ReactiveNestedSampler):
    """Region machinery only, without storage or model functions."""

    def __init__(self):
        self.use_mpi = False
        self.mpi_size = 1
        self.mpi_rank = 0
        self.region = None
        self.transformLayer = None
        self.tregion = None
        self.mesh = None
        self.wrapped_axes = []
        self.log = True
        self.logger = create_logger('test_clustering_reference_data')
        self.region_class = MLFriends
        self.transform_layer_class = AffineLayer
        self.build_tregion = False
        self.x_dim = 2
        self.rng = np.random
        self.live_points_healthy = True


def test_overclustered_npz_region_transitions():
    """Region updates across recorded live-point transitions stay sane.

    Replays the recorded (u0 -> u) live point transitions through
    _update_region, checking that the fresh clustering never produces
    lonely points (reference tests/test_clustering.py:152-210).
    """
    np.random.seed(1)
    for case in [20, 23, 24, 27, 42]:
        data = np.load(
            os.path.join(REF_TESTS, 'overclustered_%d.npz' % case))
        sampler = _BareSampler()
        nsamples, sampler.x_dim = data['u0'].shape
        ids0 = np.arange(nsamples)

        sampler._update_region(data['u0'], ids0)
        assert sampler.region is not None

        layer = sampler.transformLayer.create_new(
            data['u0'], sampler.region.maxradiussq)
        counts = np.unique(layer.clusterids, return_counts=True)[1]
        assert counts.min() > 1, (
            'lonely points', case, np.unique(layer.clusterids,
                                             return_counts=True))

        # live points changed: the radius must be invalidated first
        sampler.region.maxradiussq = None
        u1 = data['u']
        sampler._update_region(u1, np.arange(len(u1)))
        nclusters = sampler.transformLayer.nclusters
        assert nclusters >= 1
        assert len(sampler.transformLayer.clusterids) == len(u1)
