# noqa: D400 D205
"""
Bootstrapped region radius / ellipsoid enlargement kernel
---------------------------------------------------------

TPU-native replacement for the reference's bootstrap loop
(`/root/reference/ultranest/mlfriends.pyx:1017-1070`, `:1392-1440`,
`:1501-1548`, `:1569-1597`): B rounds of "select a random subset of live
points, wrap them, measure how far the *unselected* points stick out".

Key restructure versus the reference: the N x N whitened-space distance
matrix is computed **once** (one MXU matmul) and every bootstrap round is a
masked reduction over it — O(N^2 d + B N^2) instead of the reference's
O(B N^2 d). The ellipsoid enlargement rounds are batched over B via scan
(mean/cov/eigh/Mahalanobis per round).

All inputs are padded to shape buckets; invalid rows are masked. Numerical
failures (the reference raises LinAlgError / FloatingPointError) surface as
a validity flag for the host to act on.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pairwise import pairwise_sqdist, pad_rows, round_up

__all__ = ['bootstrap_radius_enlargement', 'make_bootstrap_masks']

BIG = jnp.float32(1e30)


def make_bootstrap_masks(n, nbootstraps, rng=np.random):
    """Draw bootstrap selection masks on the host RNG.

    Each round selects the *set* of points hit by n draws-with-replacement
    (multiplicity ignored, as in the reference). Degenerate rounds
    (all / none selected) are dropped, mirroring the reference's `continue`.

    Returns
    -------
    masks: bool array (nrounds, n)
    """
    masks = np.zeros((nbootstraps, n), dtype=bool)
    for i in range(nbootstraps):
        masks[i, rng.randint(n, size=n)] = True
    keep = ~(masks.all(axis=1) | ~masks.any(axis=1))
    return masks[keep]


def _masked_mean_cov(x, sel):
    """Mean and ddof=1 covariance of rows of *x* selected by bool *sel*."""
    nsel = jnp.sum(sel)
    w = sel.astype(x.dtype)
    ctr = jnp.sum(x * w[:, None], axis=0) / nsel
    xc = (x - ctr) * w[:, None]
    cov = jnp.dot(xc.T, xc, preferred_element_type=jnp.float32) \
        / jnp.maximum(nsel - 1, 1)
    return ctr, cov, nsel


def _ellipsoid_round(u, valid, sel, ndim):
    """One bootstrap round of ellipsoid enlargement in u-space.

    Returns the max squared Mahalanobis distance of unselected valid points
    to the bounding ellipsoid of the selected points.
    """
    ctr, cov, _ = _masked_mean_cov(u, sel)
    cov = cov * (ndim + 2)
    # diagonal preconditioning keeps the eigensolve well-conditioned in f32
    dscale = jnp.sqrt(jnp.maximum(jnp.diagonal(cov), 1e-30))
    corr = cov / (dscale[:, None] * dscale[None, :])
    w, v = jnp.linalg.eigh(corr)
    # relative floor replaces the reference's LinAlgError on singular cov:
    # degenerate directions get a huge-but-finite enlargement instead
    w = jnp.maximum(w, jnp.maximum(w[-1], 1e-30) * 1e-6)
    delta = (u - ctr) / dscale[None, :]
    proj = jnp.dot(delta, v, preferred_element_type=jnp.float32)
    m = jnp.sum(proj * proj / w[None, :], axis=1)
    outside = jnp.logical_and(valid, ~sel)
    return jnp.max(jnp.where(outside, m, -BIG))


def _simple_round(u, valid, sel):
    """Axis-aligned (diagonal covariance) bootstrap enlargement round."""
    nsel = jnp.sum(sel)
    w = sel.astype(u.dtype)
    ctr = jnp.sum(u * w[:, None], axis=0) / nsel
    var = jnp.sum(((u - ctr) ** 2) * w[:, None], axis=0) / nsel
    var = jnp.maximum(var, 1e-30)
    m = jnp.sum((u - ctr) ** 2 / var[None, :], axis=1)
    outside = jnp.logical_and(valid, ~sel)
    return jnp.max(jnp.where(outside, m, -BIG))


@functools.partial(jax.jit, static_argnames=('mode',))
def _bootstrap_kernel(upoints, tpoints, valid, masks, mode):
    ndim = upoints.shape[1]

    if mode in ('mlfriends',):
        d2 = pairwise_sqdist(tpoints, tpoints)

        def radius_round(carry, sel):
            d2sel = jnp.where(sel[:, None], d2, BIG)
            mind = jnp.min(d2sel, axis=0)
            outside = jnp.logical_and(valid, ~sel)
            maxd = jnp.max(jnp.where(outside, mind, -BIG))
            return jnp.maximum(carry, maxd), None

        maxd, _ = jax.lax.scan(radius_round, jnp.float32(0.0), masks)
    else:
        # sentinel; ellipsoid-only callers report 1e300 on the host side
        maxd = jnp.float32(0.0)

    if mode in ('mlfriends', 'ellipsoid', 'wrap'):
        def enlarge_round(carry, sel):
            f = _ellipsoid_round(upoints, valid, sel, ndim)
            return jnp.maximum(carry, f), None

        maxf, _ = jax.lax.scan(enlarge_round, jnp.float32(0.0), masks)
    elif mode == 'simple':
        def enlarge_round(carry, sel):
            f = _simple_round(upoints, valid, sel)
            return jnp.maximum(carry, f), None

        maxf, _ = jax.lax.scan(enlarge_round, jnp.float32(0.0), masks)
    else:
        raise ValueError("unknown mode %r" % mode)

    ok = jnp.logical_and(jnp.isfinite(maxf), maxf > 0)
    if mode == 'mlfriends':
        ok = jnp.logical_and(ok, jnp.logical_and(jnp.isfinite(maxd), maxd > 0))
    return maxd, maxf, ok


def bootstrap_radius_enlargement(upoints, tpoints, masks, mode='mlfriends'):
    """Run all bootstrap rounds on device.

    Parameters
    ----------
    upoints: array (N, d)
        live points in unit-cube space (ellipsoid space)
    tpoints: array (N, d) or None
        live points in whitened space (MLFriends radius space)
    masks: bool array (B, N)
        bootstrap selection masks from :func:`make_bootstrap_masks`
    mode: str
        'mlfriends' (radius + ellipsoid), 'ellipsoid' (robust ellipsoid
        only), 'simple' (axis-aligned), 'wrap' (wrapping ellipsoid)

    Returns
    -------
    maxradiussq: float
        MLFriends squared radius (1e300 for ellipsoid-only modes)
    enlarge: float
        squared Mahalanobis enlargement factor
    ok: bool
        False when the computation degenerated (host should keep the old
        region, mirroring the reference's exception path)

    Note: the reference applies `(d+2)` covariance inflation in all
    ellipsoid modes (`bounding_ellipsoid`, mlfriends.pyx:426-476); 'wrap'
    keeps it too. The reference's SimpleRegion enlargement reduces over the
    wrong axis (`mlfriends.pyx:1540`, summing over points rather than
    dimensions); this implementation uses the dimensionally correct
    Mahalanobis sum.
    """
    upoints = np.asarray(upoints, dtype=np.float32)
    n, _ = upoints.shape
    npd = round_up(n)
    valid = pad_rows(np.ones(n, bool), npd, False)
    up = pad_rows(upoints, npd)
    if tpoints is None:
        tp = up
    else:
        tp = pad_rows(np.asarray(tpoints, dtype=np.float32), npd)
    mk = np.zeros((len(masks), npd), dtype=bool)
    mk[:, :n] = masks
    maxd, maxf, ok = _bootstrap_kernel(up, tp, valid, mk, mode)
    return float(maxd), float(maxf), bool(ok)
