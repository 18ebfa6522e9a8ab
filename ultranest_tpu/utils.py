# noqa: D400 D205
"""
Utility helpers: logging, run directories, statistics
-----------------------------------------------------

TPU-native rebuild of the reference helpers
(cf. /root/reference/ultranest/utils.py). API-compatible; implementations
are vectorized numpy (host side — these are cold-path helpers).
"""

import errno
import logging
import os
import sys

import numpy as np

__all__ = [
    'create_logger', 'make_run_dir', 'vectorize', 'resample_equal',
    'listify', 'quantile', 'vol_prefactor', 'is_affine_transform',
    'normalised_kendall_tau_distance', 'verify_gradient',
    'distributed_work_chunk_size', 'submasks',
]

SQRTEPS = float(np.finfo(float).eps) ** 0.5


def create_logger(module_name, log_dir=None, level=logging.INFO):
    """Set up the logging channel *module_name*.

    Appends DEBUG-level records to ``debug.log`` inside *log_dir* (if given)
    and writes records at *level* or above to stdout. Idempotent: if the
    channel already has handlers, none are added.

    Parameters
    ----------
    module_name: str
        logger channel name
    log_dir: str or None
        directory for the debug.log file
    level: int
        stdout logging threshold

    Returns
    -------
    logger: logging.Logger
    """
    logger = logging.getLogger(str(module_name))
    if logger.handlers:
        return logger
    if log_dir is not None:
        fh = logging.FileHandler(os.path.join(log_dir, 'debug.log'))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter(
            '%(asctime)s [{}] [%(levelname)s] %(message)s'.format(module_name),
            datefmt='%H:%M:%S'))
        logger.addHandler(fh)
    logger.setLevel(logging.DEBUG)
    sh = logging.StreamHandler(sys.stdout)
    sh.setLevel(level)
    sh.setFormatter(logging.Formatter('[{}] %(message)s'.format(module_name)))
    logger.addHandler(sh)
    logger.addHandler(logging.NullHandler())
    return logger


def _makedirs(name):
    try:
        os.makedirs(name)
    except OSError as e:
        if e.errno != errno.EEXIST:
            raise


def make_run_dir(log_dir, run_num=None, append_run_num=True, max_run_num=10000):
    """Create a numbered output directory tree for a run.

    Layout mirrors the reference (utils.py:77-130): ``run_dir/{info,results,
    chains,extra,plots}``.

    Parameters
    ----------
    log_dir: str
        base path
    run_num: int or None
        subfolder number; auto-incremented when None
    append_run_num: bool
        whether to nest into ``runN`` subfolder
    max_run_num: int
        maximum number of automatic run subfolders

    Returns
    -------
    folderpath: dict
        keys: run_dir, info, results, chains, extra, plots
    """
    _makedirs(log_dir)
    if run_num is None or run_num == '':
        for run_num in range(1, max_run_num):
            if not os.path.exists(os.path.join(log_dir, 'run%s' % run_num)):
                break
        else:
            raise ValueError(
                "log directory '%s' already contains the maximum number "
                "of run subdirectories (%d)" % (log_dir, max_run_num))
    run_dir = os.path.join(log_dir, 'run%s' % run_num) if append_run_num else log_dir
    if not os.path.isdir(run_dir):
        print('Creating directory for new run %s' % run_dir)
        _makedirs(run_dir)
    paths = {'run_dir': run_dir}
    for sub in ('info', 'results', 'chains', 'extra', 'plots'):
        paths[sub] = os.path.join(run_dir, sub)
        _makedirs(paths[sub])
    return paths


def vectorize(function):
    """Wrap a single-point function into one accepting arrays of points."""
    def vectorized(args):
        """Vectorized version of function."""
        return np.asarray([function(arg) for arg in args])

    vectorized.__name__ = getattr(function, '__name__', vectorized.__name__)
    return vectorized


def resample_equal(samples, weights, rstate=None):
    """Systematic resampling to equally weighted samples.

    Each input sample appears ``floor(w*N)`` or ``ceil(w*N)`` times in the
    output (cf. reference utils.py:149-215). Output order is shuffled.

    Parameters
    ----------
    samples: array (N, ...)
        weighted samples
    weights: array (N,)
        sample weights, must sum to 1
    rstate: numpy random state or None

    Returns
    -------
    equal_weight_samples: array, same shape as samples
    """
    weights = np.asarray(weights)
    if abs(weights.sum() - 1.0) > SQRTEPS:
        raise ValueError("weights do not sum to 1 (%g)" % weights.sum())
    if rstate is None:
        rstate = np.random
    N = len(weights)
    # systematic comb positions with a single random offset,
    # inverted through the cdf in one vectorized searchsorted
    positions = (rstate.random() + np.arange(N)) / N
    cdf = np.cumsum(weights)
    cdf[-1] = max(cdf[-1], positions[-1] + np.finfo(float).eps)
    idx = np.searchsorted(cdf, positions, side='right')
    idx = np.clip(idx, 0, N - 1).astype(np.int_)
    rstate.shuffle(idx)
    return samples[idx]


def listify(*args):
    """Concatenate the given iterables into one list."""
    out = []
    for a in args:
        out += list(a)
    return out


def quantile(x, q, weights=None):
    """Compute (weighted) quantiles of samples *x* at levels *q*."""
    x = np.atleast_1d(x)
    q = np.atleast_1d(q)
    if np.any(q < 0.0) or np.any(q > 1.0):
        raise ValueError("Quantiles must be between 0. and 1.")
    if weights is None:
        return np.percentile(x, list(100.0 * q))
    weights = np.atleast_1d(weights)
    if len(x) != len(weights):
        raise ValueError("Dimension mismatch: len(weights) != len(x).")
    idx = np.argsort(x)
    sw = weights[idx]
    cdf = np.cumsum(sw)[:-1]
    cdf /= cdf[-1]
    cdf = np.append(0, cdf)
    return np.interp(q, cdf, x[idx]).tolist()


def vol_prefactor(n):
    """Volume constant of an *n*-dimensional unit sphere."""
    if n % 2 == 0:
        f, i = 1.0, 2
    else:
        f, i = 2.0, 3
    while i <= n:
        f *= 2.0 / i * np.pi
        i += 2
    return f


def is_affine_transform(a, b):
    """Check whether points *b* are an axis-wise affine image of points *a*.

    Returns False for rotations (per-axis slopes must agree across pairs).
    """
    n, da = a.shape
    nb, db = b.shape
    assert n == nb
    assert db >= da
    n = (n // 2) * 2
    a1, a2 = a[0:n:2], a[1:n:2]
    b1, b2 = b[0:n:2, :da], b[1:n:2, :da]
    with np.errstate(divide='ignore', invalid='ignore'):
        slopes = (b2 - b1) / (a2 - a1)
    if not np.allclose(slopes, slopes[0]):
        return False
    offsets = b1 - slopes * a1
    return bool(np.allclose(offsets, offsets[0]))


def normalised_kendall_tau_distance(values1, values2, i=None, j=None):
    """Normalised Kendall tau distance between two equally sized rankings.

    *i*, *j* may be precomputed ``np.meshgrid(np.arange(N), np.arange(N))``
    index matrices (kept for API compatibility; unused by the vectorized
    implementation).
    """
    N = len(values1)
    if len(values2) != N:
        raise AssertionError("Both lists have to be of equal length")
    if N < 2:
        return 0.0
    a = np.argsort(values1)
    b = np.argsort(values2)
    # pairwise order disagreement, fully vectorized
    sa = np.sign(a[:, None] - a[None, :])
    sb = np.sign(b[:, None] - b[None, :])
    ndisordered = np.count_nonzero(sa * sb < 0)
    return ndisordered / (N * (N - 1))


def _merge_transform_loglike_gradient_function(transform, loglike, gradient):
    def transform_loglike_gradient(u):
        """Combine transform, likelihood and gradient function."""
        p = transform(u.reshape((1, -1)))
        return p[0], loglike(p)[0], gradient(u)
    return transform_loglike_gradient


def verify_gradient(ndim, transform, loglike, gradient, verbose=False, combination=False):
    """Numerically check a user gradient function for plausibility.

    Raises AssertionError on failure. All functions vectorized; *gradient*
    takes a single unit-cube point. If *combination*, gradient returns
    ``(params, loglike, grad)`` directly.
    """
    if combination:
        transform_loglike_gradient = gradient
    else:
        transform_loglike_gradient = _merge_transform_loglike_gradient_function(
            transform, loglike, gradient)

    eps = 1e-6
    for _ in range(10):
        u = np.random.uniform(2 * eps, 1 - 2 * eps, size=(1, ndim))
        theta = transform(u)
        Lref = loglike(theta)[0]
        p, L, grad = transform_loglike_gradient(u[0, :])
        assert np.allclose(p, theta), (p, theta)
        assert np.allclose(L, Lref), (L, Lref)
        step = eps * grad / (grad**2).sum()**0.5
        uprime = u + step
        Lprime = loglike(transform(uprime))[0]
        Lexpected = Lref + np.dot(step, grad)
        if verbose:
            print("verify_gradient:", u, L, Lprime, Lexpected)
        assert np.allclose(Lprime, Lexpected, atol=0.1 / ndim), \
            (u, uprime, grad, L, Lprime, Lexpected)


def distributed_work_chunk_size(num_total_tasks, mpi_rank, mpi_size):
    """Number of tasks assigned to shard *mpi_rank* of *mpi_size* shards."""
    return (num_total_tasks + mpi_size - 1 - mpi_rank) // mpi_size


def submasks(mask, *masks):
    """Indices such that ``a[indices] == a[mask][mask1][mask2]...``."""
    indices, = np.where(mask)
    for othermask in masks:
        indices = indices[othermask]
    return indices
