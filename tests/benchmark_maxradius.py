"""Micro-benchmark of the region kernels across dimensionality and size.

Mirrors the reference harness (`tests/benchmark_maxradius.py`): times the
bootstrapped radius computation, layer transform and membership test over
a grid of (ndim, npoints). Run directly::

    python tests/benchmark_maxradius.py
"""
import time

import numpy as np


def main():
    from ultranest_tpu.mlfriends import AffineLayer, MLFriends
    from ultranest_tpu.ops.bootstrap import (bootstrap_radius_enlargement,
                                             make_bootstrap_masks)

    print('%6s %6s %12s %12s %12s' % (
        'ndim', 'npts', 'radius[ms]', 'transform[ms]', 'inside[ms]'))
    for ndim in [2, 4, 8, 16, 32, 64]:
        for npts in [100, 400, 1000, 4000]:
            rng = np.random.RandomState(1)
            u = rng.uniform(0.3, 0.7, size=(npts, ndim))
            layer = AffineLayer()
            layer.optimize(u, u)
            region = MLFriends(u, layer)
            masks = make_bootstrap_masks(npts, 30, rng=rng)

            # warm up the jit caches
            bootstrap_radius_enlargement(u, region.unormed, masks)
            nrep = 3
            t0 = time.time()
            for _ in range(nrep):
                maxd, maxf, ok = bootstrap_radius_enlargement(
                    u, region.unormed, masks)
            t_radius = (time.time() - t0) / nrep * 1000

            q = rng.uniform(0.3, 0.7, size=(1000, ndim))
            t0 = time.time()
            for _ in range(nrep):
                layer.transform(q)
            t_transform = (time.time() - t0) / nrep * 1000

            region.maxradiussq = maxd
            region.enlarge = maxf
            region.create_ellipsoid()
            region.inside(q)
            t0 = time.time()
            for _ in range(nrep):
                region.inside(q)
            t_inside = (time.time() - t0) / nrep * 1000

            print('%6d %6d %12.2f %12.3f %12.2f' % (
                ndim, npts, t_radius, t_transform, t_inside))


if __name__ == '__main__':
    main()
