# noqa: D400 D205
"""
Sparsely sampled, virtual sampling paths
----------------------------------------

Ray geometry in the unit cube for trajectory-based samplers: box
intersections, reflections off cube walls and region spheres, and lazy
interpolation/extrapolation along a discretized path. Rebuild of
`/root/reference/ultranest/samplingpath.py` (experimental family).
"""

import numpy as np
from numpy.linalg import norm

__all__ = [
    'nearest_box_intersection_line', 'box_line_intersection',
    'linear_steps_with_reflection', 'get_sphere_tangent',
    'get_sphere_tangents', 'reflect', 'distances', 'isunitlength', 'angle',
    'extrapolate_ahead', 'interpolate', 'SamplingPath',
    'ContourSamplingPath',
]


def nearest_box_intersection_line(ray_origin, ray_direction, fwd=True):
    r"""Find the nearest intersection of a ray with the unit cube.

    Parameters
    ----------
    ray_origin: vector
        starting point (inside the cube)
    ray_direction: vector
        direction
    fwd: bool
        look forward (positive t) or backward

    Returns
    -------
    p: vector
        intersection point (clipped into the cube)
    t: float
        line coordinate of the intersection
    i: int array
        axes that flip direction there
    """
    assert (ray_origin >= 0).all(), ray_origin
    assert (ray_origin <= 1).all(), ray_origin
    assert ((ray_direction**2).sum()**0.5 > 1e-200).all(), ray_direction

    with np.errstate(divide='ignore', invalid='ignore'):
        m = 1.0 / ray_direction
        n = m * (ray_origin - 0.5)
        k = np.abs(m) * 0.5
        if fwd:
            t2 = -n + k
            tF = np.nanmin(t2)
            iF = np.where(t2 == tF)[0]
        else:
            t1 = -n - k
            tF = np.nanmax(t1)
            iF = np.where(t1 == tF)[0]

    pF = ray_origin + ray_direction * tF
    eps = 1e-6
    assert (pF >= -eps).all(), (pF, ray_origin, ray_direction)
    assert (pF <= 1 + eps).all(), (pF, ray_origin, ray_direction)
    pF = np.clip(pF, 0, 1)
    return pF, tF, iF


def box_line_intersection(ray_origin, ray_direction):
    """Find both intersections of a line with the unit cube.

    Returns ``((pN, tN, iN), (pF, tF, iF))`` for the backward and forward
    crossings.
    """
    pF, tF, iF = nearest_box_intersection_line(ray_origin, ray_direction,
                                               fwd=True)
    pN, tN, iN = nearest_box_intersection_line(ray_origin, ray_direction,
                                               fwd=False)
    assert not (tN > tF or tF < 0), "no intersection"
    return (pN, tN, iN), (pF, tF, iF)


def linear_steps_with_reflection(ray_origin, ray_direction, t,
                                 wrapped_dims=None):
    """Travel *t* units along the ray, reflecting off the cube walls.

    Wrapped (circular) dimensions pass through instead of reflecting; a
    second bump into an already-crossed wrapped axis ends the path early.

    Returns (new_point, new_direction).
    """
    if t == 0:
        return ray_origin, ray_direction
    if t < 0:
        new_point, new_direction = linear_steps_with_reflection(
            ray_origin, -ray_direction, -t)
        return new_point, -new_direction

    if wrapped_dims is not None:
        reflected = np.zeros(len(ray_origin), dtype=bool)

    tleft = 1.0 * t
    while True:
        p, t, i = nearest_box_intersection_line(ray_origin, ray_direction,
                                                fwd=True)
        assert np.isfinite(p).all()
        assert t >= 0, t
        if tleft <= t:
            return ray_origin + tleft * ray_direction, ray_direction
        ray_origin = p
        ray_direction = ray_direction.copy()
        if wrapped_dims is None:
            ray_direction[i] *= -1
        else:
            if np.logical_and(reflected[i], wrapped_dims[i]).any():
                return ray_origin, ray_direction
            reflected[i] = True
            ray_direction[i] *= np.where(wrapped_dims[i], 1, -1)
            ray_origin[i] = np.where(wrapped_dims[i], 1 - ray_origin[i],
                                     ray_origin[i])
        tleft -= t


def get_sphere_tangent(sphere_center, edge_point):
    """Unit normal at a sphere surface point, pointing to the center."""
    arrow = sphere_center - edge_point
    return arrow / norm(arrow)


def get_sphere_tangents(sphere_center, edge_point):
    """Vectorized :func:`get_sphere_tangent` over rows."""
    arrow = sphere_center - edge_point
    return arrow / norm(arrow, axis=1).reshape((-1, 1))


def reflect(v, normal):
    """Reflect vector *v* off a *normal* vector."""
    return v - 2 * (normal * v).sum() * normal


def distances(direction, center, r=1):
    """Line coordinates where a unit-speed ray from 0 crosses a sphere.

    Returns (tpos, tneg); asserts that the line crosses the sphere.
    """
    loc = (direction * center).sum()
    osqrnorm = (center**2).sum()
    rootterm = loc**2 - osqrnorm + r**2
    assert (rootterm > 0).all(), rootterm
    return -loc + rootterm**0.5, -loc - rootterm**0.5


def isunitlength(vec):
    """Assert that *vec* has unit length."""
    assert np.isclose(norm(vec), 1), norm(vec)


def angle(a, b):
    """Dot product of vectors *a* and *b*."""
    return (a * b).sum()


def extrapolate_ahead(dj, xj, vj, contourpath=None):
    """Take *dj* integer steps of size *vj* from *xj* with cube reflections."""
    assert dj == int(dj)
    return linear_steps_with_reflection(xj, vj, dj)


def interpolate(i, points, fwd_possible, rwd_possible, contourpath=None):
    """Reconstruct the point with index *i* on a sparsely stored path.

    Returns (x, v, L, on_path): L is None if the point has not been
    evaluated; on_path is False when the path terminates before *i*.
    """
    points_before = [(j, xj, vj, Lj) for j, xj, vj, Lj in points if j <= i]
    points_after = [(j, xj, vj, Lj) for j, xj, vj, Lj in points if j >= i]

    if len(points_after) == 0 and not fwd_possible:
        j, xj, vj, Lj = max(points_before)
        return xj, vj, Lj, False
    if len(points_before) == 0 and not rwd_possible:
        k, xk, vk, Lk = min(points_after)
        return xk, vk, Lk, False
    if len(points_before) == 0 or len(points_after) == 0:
        raise KeyError("cannot extrapolate outside path")

    j, xj, vj, Lj = max(points_before)
    k, xk, vk, Lk = min(points_after)
    if j == i:
        return xj, vj, Lj, True
    assert k != i

    xl1, vj1 = extrapolate_ahead(i - j, xj, vj, contourpath=contourpath)
    xl2, vj2 = extrapolate_ahead(i - k, xk, vk, contourpath=contourpath)
    assert np.allclose(xl1, xl2), (xl1, xl2, i, j, k, xj, vj, xk, vk)
    assert np.allclose(vj1, vj2), (xl1, vj1, xl2, vj2, i, j, k)
    return xl1, vj1, None, True


class SamplingPath:
    """A path stored as a sparse sequence of (index, x, v, L) tuples."""

    def __init__(self, x0, v0, L0):
        """Initialise with starting point (index 0)."""
        self.reset(x0, v0, L0)

    def add(self, i, xi, vi, Li):
        """Add evaluated point *xi* with direction *vi*, value *Li* at index *i*."""
        assert Li is not None
        assert len(xi.shape) == 1, (xi, xi.shape)
        assert len(vi.shape) == 1, (vi, vi.shape)
        assert len(np.shape(Li)) == 0, Li
        self.points.append((i, xi, vi, Li))

    def reset(self, x0, v0, L0):
        """Reset the path to a new starting point."""
        self.points = []
        self.add(0, x0, v0, L0)
        self.fwd_possible = True
        self.rwd_possible = True

    def plot(self, **kwargs):
        """Plot the path (first two dimensions)."""
        import matplotlib.pyplot as plt
        x = np.array([x for i, x, v, L in sorted(self.points)])
        p, = plt.plot(x[:, 0], x[:, 1], 'o ', **kwargs)
        ilo, _, _, _ = min(self.points)
        ihi, _, _, _ = max(self.points)
        x = np.array([self.interpolate(i)[0] for i in range(ilo, ihi + 1)])
        kwargs['color'] = p.get_color()
        plt.plot(x[:, 0], x[:, 1], 'o-', ms=4, mfc='None', **kwargs)

    def interpolate(self, i):
        """Interpolate point with index *i* on the path."""
        return interpolate(i, self.points, fwd_possible=self.fwd_possible,
                           rwd_possible=self.rwd_possible)

    def extrapolate(self, i):
        """Extrapolate beyond the path ends to index *i*."""
        if i >= 0:
            j, xj, vj, Lj = max(self.points)
            deltai = i - j
            assert deltai > 0, ("should be extrapolating", i, j)
        else:
            j, xj, vj, Lj = min(self.points)
            deltai = i - j
            assert deltai < 0, ("should be extrapolating", i, j)
        return extrapolate_ahead(deltai, xj, vj)


class ContourSamplingPath:
    """Sampling path that can estimate likelihood-contour normals.

    The gradient guess is the mean direction towards the nearby live-point
    sphere centers, computed in whitened space.
    """

    def __init__(self, samplingpath, region):
        """Initialise with *samplingpath* and *region*."""
        self.samplingpath = samplingpath
        self.points = self.samplingpath.points
        self.region = region

    def add(self, i, x, v, L):
        """Add evaluated point to the underlying path."""
        self.samplingpath.add(i, x, v, L)

    def interpolate(self, i):
        """Interpolate point with index *i* on the path."""
        return interpolate(
            i, self.samplingpath.points,
            fwd_possible=self.samplingpath.fwd_possible,
            rwd_possible=self.samplingpath.rwd_possible,
            contourpath=self)

    def extrapolate(self, i):
        """Extrapolate beyond the path ends to index *i*."""
        if i >= 0:
            j, xj, vj, Lj = max(self.samplingpath.points)
            deltai = i - j
            assert deltai > 0, ("should be extrapolating", i, j)
        else:
            j, xj, vj, Lj = min(self.samplingpath.points)
            deltai = i - j
            assert deltai < 0, ("should be extrapolating", i, j)
        return extrapolate_ahead(deltai, xj, vj, contourpath=self)

    def gradient(self, reflpoint, plot=False):
        """Estimate the contour normal at *reflpoint*.

        Finds the live-point spheres covering *reflpoint* (or the nearest
        one), takes their whitened mean center, and returns the unit vector
        from *reflpoint* towards it, mapped back to u-space.
        """
        region = self.region
        bpts = region.transformLayer.transform(reflpoint.reshape((1, -1)))
        dist = ((bpts - region.unormed)**2).sum(axis=1)
        nearby = dist < region.maxradiussq
        if not nearby.any():
            nearby = dist == dist.min()

        tsphere_centers = region.unormed[nearby, :]
        tsphere_center = tsphere_centers.mean(axis=0)
        tt = get_sphere_tangent(tsphere_center, bpts.flatten())

        # map the tangent back to u-space by finite differencing
        sphere_center = region.transformLayer.untransform(tsphere_center)
        t = region.transformLayer.untransform(
            tt * 1e-3 + tsphere_center) - sphere_center

        normal = t / norm(t)
        isunitlength(normal)
        return normal
