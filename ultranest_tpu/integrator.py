# noqa: D400 D205
"""
Nested sampling integrators
---------------------------

High-level drivers computing Bayesian evidence and posterior samples for
arbitrary likelihood/transform pairs: the reactive
:class:`ReactiveNestedSampler` and the textbook :class:`NestedSampler`.

TPU-native rebuild of `/root/reference/ultranest/integrator.py`. The
data-dependent outer loop stays on the host; all O(N^2 d) region work and
batched membership filtering run on device via :mod:`ultranest_tpu.ops`,
and candidate batches are sized in power-of-two buckets so XLA compile
caches stay warm. Distribution is mesh/`shard_map` based
(:mod:`ultranest_tpu.parallel`) rather than MPI; likelihood batching
(`vectorized=True`, adaptive ``ndraw``) is the primary device axis.
"""

import csv
import json
import operator
import os
import sys
import time
import warnings

import numpy as np
from numpy import exp, log, logaddexp

from .mlfriends import (AffineLayer, LocalAffineLayer, MLFriends,
                        RobustEllipsoidRegion, ScalingLayer, SimpleRegion,
                        WrappingEllipsoid, find_nearby)  # noqa: F401
from .ops.pairwise import match_clusters
from .netiter import (BreadthFirstIterator, MultiCounter, PointPile,
                      SingleCounter, TreeNode, combine_results,
                      count_tree_between, dump_tree, find_nodes_before,
                      logz_sequence)
from .ordertest import UniformOrderAccumulator
from .store import HDF5PointStore, NullPointStore, TextPointStore
from .utils import (create_logger, distributed_work_chunk_size,
                    is_affine_transform)
from .utils import listify as _listify
from .utils import (make_run_dir, normalised_kendall_tau_distance,
                    resample_equal, vectorize, vol_prefactor)
from .viz import get_default_viz_callback

__all__ = ['ReactiveNestedSampler', 'NestedSampler', 'read_file',
           'warmstart_from_similar_file']

int_t = np.int64


def _next_pow2(n):
    """Smallest power of two >= n (shape bucketing for jit caches)."""
    return 1 << (int(n) - 1).bit_length()


def _get_cumsum_range(pi, dp):
    """Conservative quantile index interval [ilo, ihi] of probabilities *pi*."""
    ci = pi.cumsum()
    ilo, = np.where(ci >= dp)
    ilo = ilo[0] if len(ilo) > 0 else 0
    ihi, = np.where(ci <= 1.0 - dp)
    ihi = ihi[-1] if len(ihi) > 0 else -1
    return ilo, ihi


def _sequentialize_width_sequence(minimal_widths, min_width):
    """Turn (Llo, Lhi, width) requirements into an ordered (L, width) plan.

    The width is made to increase monotonically towards the maximum from
    both sides, filling intermediate dips.
    """
    Lpoints = np.unique(_listify(
        [-np.inf], [L for L, _, _ in minimal_widths],
        [L for _, L, _ in minimal_widths], [np.inf]))
    widths = np.ones(len(Lpoints)) * min_width

    for Llo, Lhi, width in minimal_widths:
        mask = ~np.logical_or(Lpoints < Llo, Lpoints > Lhi)
        widths[mask] = np.where(widths[mask] < width, width, widths[mask])

    max_width = widths.max()
    mid = np.where(widths == max_width)[0][0]
    widest = 0
    for i in range(mid):
        widest = widths[i] = max(widest, widths[i])
    widest = 0
    for i in range(len(widths) - 1, mid, -1):
        widest = widths[i] = max(widest, widths[i])

    return list(zip(Lpoints, widths))


def _explore_iterator_batch(explorer, pop, x_dim, num_params, pointpile,
                            batchsize=1):
    """Replay a stored run through *explorer*, yielding batches of nodes."""
    batch = []
    while True:
        next_node = explorer.next_node()
        if next_node is None:
            break
        rootid, node, (_, active_rootids, active_values, active_node_ids) = next_node
        Lmin = node.value
        children = []
        _, row = pop(Lmin)
        if row is not None:
            logl = row[1]
            u = row[3:3 + x_dim]
            v = row[3 + x_dim:3 + x_dim + num_params]
            assert logl > Lmin
            children.append((u, v, logl))
            node.children.append(pointpile.make_node(logl, u, v))
        batch.append((Lmin, active_values.copy(), children))
        if len(batch) >= batchsize:
            yield batch
            batch = []
        explorer.expand_children_of(rootid, node)
    if batch:
        yield batch


def resume_from_similar_file(log_dir, x_dim, loglikelihood, transform,
                             max_tau=0, verbose=False, ndraw=400):
    """Adapt a stored run to a modified likelihood function in place.

    Replays the stored tree while re-evaluating the new likelihood; keeps
    iterating as long as the live point order stays within *max_tau*
    normalised Kendall tau distance of the stored order, then truncates.

    Parameters
    ----------
    log_dir: str
        run directory containing ``results/points.hdf5``
    x_dim: int
        dimensionality
    loglikelihood, transform: functions
        new vectorized model functions
    max_tau: float
        0 (conservative) .. 1 (negligent) allowed live-point disorder
    verbose: bool or int
        progress reporting
    ndraw: int
        likelihood evaluation batch size
    """
    import h5py
    filepath = os.path.join(log_dir, 'results', 'points.hdf5')
    filepath2 = os.path.join(log_dir, 'results', 'points.hdf5.new')
    with h5py.File(filepath, 'r') as fileobj:
        _, ncols = fileobj['points'].shape
        num_params = ncols - 3 - x_dim
        points = fileobj['points'][:]

    pointstore2 = HDF5PointStore(filepath2, ncols, mode='w')
    stack = list(enumerate(points))

    pointpile = PointPile(x_dim, num_params)
    pointpile2 = PointPile(x_dim, num_params)

    def pop(Lmin):
        """Find the first stored row matching threshold *Lmin*."""
        for i, (idx, next_row) in enumerate(stack):
            row_Lmin = next_row[0]
            L = next_row[1]
            if row_Lmin <= Lmin and L > Lmin:
                idx, row = stack.pop(i)
                return idx, row
        return None, None

    roots = []
    roots2 = []
    initial_points_u = []
    initial_points_v = []
    initial_points_logl = []
    while True:
        _, row = pop(-np.inf)
        if row is None:
            break
        initial_points_u.append(row[3:3 + x_dim])
        initial_points_v.append(row[3 + x_dim:3 + x_dim + num_params])
        initial_points_logl.append(row[1])

    v2 = transform(np.array(initial_points_u, ndmin=2, dtype=float))
    assert np.allclose(v2, initial_points_v), \
        'transform inconsistent, cannot resume'
    logls_new = loglikelihood(v2)

    for u, v, logl, logl_new in zip(initial_points_u, initial_points_v,
                                    initial_points_logl, logls_new):
        roots.append(pointpile.make_node(logl, u, v))
        roots2.append(pointpile2.make_node(logl_new, u, v))
        pointstore2.add(_listify([-np.inf, logl_new, 0.0], u, v), 1)

    explorer = BreadthFirstIterator(roots)
    explorer2 = BreadthFirstIterator(roots2)
    main_iterator2 = SingleCounter()
    main_iterator2.Lmax = logls_new.max()
    good_state = True

    last_good_like = -1e300
    last_good_state = 0
    epsilon = 1 + 1e-6
    niter = 0
    for batch in _explore_iterator_batch(explorer, pop, x_dim, num_params,
                                         pointpile, batchsize=ndraw):
        batch_u = np.array([u for _, _, children in batch
                            for u, _, _ in children], ndmin=2, dtype=float)
        if batch_u.size > 0:
            batch_v = np.array([v for _, _, children in batch
                                for _, v, _ in children], ndmin=2, dtype=float)
            v2 = transform(batch_u)
            assert np.allclose(v2, batch_v), \
                'transform inconsistent, cannot resume'
            logls_new = loglikelihood(batch_v)
        else:
            logls_new = []

        j = 0
        for _Lmin, active_values, children in batch:
            next_node2 = explorer2.next_node()
            rootid2, node2, (active_nodes2, _, active_values2, _) = next_node2
            Lmin2 = float(node2.value)

            if len(active_values) != len(active_values2):
                if verbose == 2:
                    print("stopping, number of live points differ (%d vs %d)"
                          % (len(active_values), len(active_values2)))
                good_state = False
                break

            tau = normalised_kendall_tau_distance(active_values, active_values2)
            order_consistent = tau <= max_tau
            if order_consistent and len(active_values) > 10:
                good_state = True
            elif not order_consistent:
                good_state = False
            if good_state:
                last_good_like = Lmin2
                last_good_state = niter
            else:
                # pretend likelihood keeps increasing slightly, hoping the
                # divergence stays below the local step size
                Lmin2 = last_good_like
                node2.value = Lmin2
                last_good_like = last_good_like * epsilon
                break

            for u, v, _logl_old in children:
                logl_new = logls_new[j]
                j += 1
                child2 = pointpile2.make_node(logl_new, u, v)
                node2.children.append(child2)
                if logl_new > Lmin2:
                    pointstore2.add(_listify([Lmin2, logl_new, 0.0], u, v), 1)

            main_iterator2.passing_node(node2, active_nodes2)
            niter += 1
            if verbose:
                sys.stderr.write("%d...\r" % niter)
            explorer2.expand_children_of(rootid2, node2)

        if not good_state:
            break

    if verbose:
        sys.stderr.write("%d/%d iterations salvaged (%.2f%%).\n" % (
            last_good_state + 1, len(points),
            (last_good_state + 1) * 100.0 / len(points)))

    mask = pointstore2.fileobj['points'][:, 0] <= last_good_like
    points2 = pointstore2.fileobj['points'][:][mask, :]
    del pointstore2.fileobj['points']
    pointstore2.fileobj.create_dataset(
        'points', dtype=np.float64,
        shape=(0, pointstore2.ncols), maxshape=(None, pointstore2.ncols))
    pointstore2.fileobj['points'].resize(len(points2), axis=0)
    pointstore2.fileobj['points'][:] = points2
    pointstore2.close()
    os.replace(filepath2, filepath)


def _update_region_bootstrap(region, nbootstraps, minvol=0.0, comm=None,
                             mpi_size=1, rng=np.random):
    """Update *region* radius/enlargement with bootstrapping (device-batched)."""
    assert nbootstraps > 0, nbootstraps
    try:
        r, f = region.compute_enlargement(
            minvol=minvol, nbootstraps=max(1, nbootstraps // mpi_size),
            rng=rng)
    except np.linalg.LinAlgError:
        raise
    region.maxradiussq = r
    region.enlarge = f
    return r, f


class NestedSampler:
    """Textbook fixed-live-point nested sampler (reference implementation)."""

    def __init__(self,
                 param_names,
                 loglike,
                 transform=None,
                 derived_param_names=[],
                 resume='subfolder',
                 run_num=None,
                 log_dir='logs/test',
                 num_live_points=1000,
                 vectorized=False,
                 wrapped_params=[],
                 seed=None,
                 ):
        """Set up the fixed-N nested sampler.

        Parameters
        ----------
        param_names: list of str
            parameter names; length sets the dimensionality
        loglike: function
            vectorized log-likelihood (if *vectorized*)
        transform: function or None
            vectorized unit-cube-to-physical transform
        derived_param_names: list of str
            extra columns returned by transform
        log_dir: str
            output directory
        resume: 'resume', 'overwrite' or 'subfolder'
            resume behaviour
        wrapped_params: list of bools
            circular parameter flags
        num_live_points: int
            number of live points
        vectorized: bool
            whether user functions accept arrays of points
        run_num: int or None
            subfolder number
        seed: int or None
            seed for the sampler's private RNG (None: global numpy RNG)
        """
        self.paramnames = list(param_names)
        x_dim = len(self.paramnames)
        self.num_live_points = num_live_points
        self.sampler = 'nested'
        self.x_dim = x_dim
        self.derivedparamnames = derived_param_names
        self.num_params = x_dim + len(derived_param_names)
        self.volfactor = vol_prefactor(self.x_dim)
        self.rng = np.random.RandomState(seed) if seed is not None else np.random
        if wrapped_params is None:
            self.wrapped_axes = []
        else:
            self.wrapped_axes = np.where(wrapped_params)[0]

        assert resume or resume in ('overwrite', 'subfolder', 'resume'), \
            "resume should be one of 'overwrite' 'subfolder' or 'resume'"
        append_run_num = resume == 'subfolder'
        resume = resume == 'resume' or resume is True

        if not vectorized:
            transform = vectorize(transform) if transform is not None else None
            loglike = vectorize(loglike)

        self.transform = (lambda x: x) if transform is None else transform

        u = self.rng.uniform(size=(2, self.x_dim))
        p = self.transform(u)
        assert p.shape == (2, self.num_params), (
            "Error in transform function: returned shape is %s, expected %s"
            % (p.shape, (2, self.num_params)))
        logl = loglike(p)
        assert np.logical_and(u > 0, u < 1).all(), (
            "Error in transform function: u was modified!")
        assert np.shape(logl) == (2,), (
            "Error in loglikelihood function: returned shape is %s" % str(np.shape(logl)))
        assert np.isfinite(logl).all(), (
            "Error in loglikelihood function: returned non-finite values")

        def safe_loglike(x):
            """Evaluate likelihood, asserting finiteness."""
            x = np.asarray(x)
            logl = loglike(x)
            assert np.isfinite(logl).all(), (
                'User-provided loglikelihood returned non-finite value')
            return logl

        self.loglike = safe_loglike

        self.use_mpi = False
        self.comm = None
        self.mpi_size = 1
        self.mpi_rank = 0

        self.log = True
        self.log_to_disk = log_dir is not None
        if log_dir is not None:
            self.logs = make_run_dir(log_dir, run_num,
                                     append_run_num=append_run_num)
            log_dir = self.logs['run_dir']
        else:
            log_dir = None
        self.logger = create_logger(
            __name__ + '.' + type(self).__name__, log_dir=log_dir)
        self.logger.info('Num live points [%d]', self.num_live_points)

        if self.log_to_disk:
            self.pointstore = HDF5PointStore(
                os.path.join(self.logs['results'], 'points.hdf5'),
                3 + self.x_dim + self.num_params,
                mode='a' if resume else 'w')
        else:
            self.pointstore = NullPointStore(3 + self.x_dim + self.num_params)

    def run(self, update_interval_iter=None, update_interval_ncall=None,
            log_interval=None, dlogz=0.001, max_iters=None):
        """Run until the remainder fraction falls below *dlogz*.

        Returns a results dict with samples, weighted_samples, ncall,
        niter, logz and logzerr.
        """
        if update_interval_ncall is None:
            update_interval_ncall = max(1, round(self.num_live_points))
        if update_interval_iter is None:
            if update_interval_ncall == 0:
                update_interval_iter = max(1, round(self.num_live_points))
            else:
                update_interval_iter = max(1, round(0.2 * self.num_live_points))
        if log_interval is None:
            log_interval = max(1, round(0.2 * self.num_live_points))
        else:
            log_interval = round(log_interval)
            if log_interval < 1:
                raise ValueError("log_interval must be >= 1")

        viz_callback = get_default_viz_callback()

        # replay stored initial live points, then fill from the prior
        prev_u, prev_v, prev_logl = [], [], []
        for _ in range(self.num_live_points):
            _, row = self.pointstore.pop(-np.inf)
            if row is None:
                break
            prev_logl.append(row[1])
            prev_u.append(row[3:3 + self.x_dim])
            prev_v.append(row[3 + self.x_dim:3 + self.x_dim + self.num_params])
        prev_u = np.array(prev_u)
        prev_v = np.array(prev_v)
        prev_logl = np.array(prev_logl)
        num_live_points_missing = self.num_live_points - len(prev_logl)

        if num_live_points_missing > 0:
            active_u = self.rng.uniform(
                size=(num_live_points_missing, self.x_dim))
            active_v = self.transform(active_u)
            active_logl = self.loglike(active_v)
            if self.log_to_disk:
                for i in range(num_live_points_missing):
                    self.pointstore.add(
                        _listify([-np.inf, active_logl[i], 0.0],
                                 active_u[i, :], active_v[i, :]),
                        num_live_points_missing)
            if len(prev_u) > 0:
                active_u = np.concatenate((prev_u, active_u))
                active_v = np.concatenate((prev_v, active_v))
                active_logl = np.concatenate((prev_logl, active_logl))
        else:
            active_u, active_v, active_logl = prev_u, prev_v, prev_logl

        use_point_stack = True
        saved_u, saved_v, saved_logl, saved_logwt = [], [], [], []
        h = 0.0
        logz = -1e300
        logvol = log(1.0 - exp(-1.0 / self.num_live_points))
        logz_remain = np.max(active_logl)
        fraction_remain = 1.0
        ncall = num_live_points_missing
        first_time = True
        if self.x_dim > 1:
            transformLayer = AffineLayer(wrapped_dims=self.wrapped_axes)
        else:
            transformLayer = ScalingLayer(wrapped_dims=self.wrapped_axes)
        transformLayer.optimize(active_u, active_u)
        region = MLFriends(active_u, transformLayer)

        self.logger.info('Starting sampling ...')
        ib = 0
        samples = []
        samplesv = []
        likes = []
        ndraw = 128
        it = 0
        next_update_interval_ncall = -1
        next_update_interval_iter = -1

        while max_iters is None or it < max_iters:
            worst = np.argmin(active_logl)
            logwt = logvol + active_logl[worst]
            logz_new = np.logaddexp(logz, logwt)
            h = (exp(logwt - logz_new) * active_logl[worst]
                 + exp(logz - logz_new) * (h + logz) - logz_new)
            logz = logz_new

            saved_u.append(np.array(active_u[worst]))
            saved_v.append(np.array(active_v[worst]))
            saved_logwt.append(logwt)
            saved_logl.append(active_logl[worst])

            loglstar = active_logl[worst]

            if ncall > next_update_interval_ncall and it > next_update_interval_iter:
                if first_time:
                    nextregion = region
                else:
                    nextTransformLayer = transformLayer.create_new(
                        active_u, region.maxradiussq)
                    nextregion = MLFriends(active_u, nextTransformLayer)
                _update_region_bootstrap(nextregion, 30, 0.0, None, 1,
                                         rng=self.rng)
                # only accept a shrinking region (avoids mode reconnection)
                if nextregion.estimate_volume() < region.estimate_volume():
                    region = nextregion
                    transformLayer = region.transformLayer
                region.create_ellipsoid(
                    minvol=exp(-it / self.num_live_points) * self.volfactor)
                if self.log:
                    viz_callback(
                        points=dict(u=active_u, p=active_v, logl=active_logl),
                        info=dict(it=it, ncall=ncall, logz=logz,
                                  logz_remain=logz_remain,
                                  paramnames=self.paramnames + self.derivedparamnames,
                                  logvol=logvol),
                        region=region, transformLayer=transformLayer)
                    self.pointstore.flush()
                next_update_interval_ncall = ncall + update_interval_ncall
                next_update_interval_iter = it + update_interval_iter
                first_time = False

            while True:
                if ib >= len(samples) and use_point_stack:
                    # replay a stored point, if available
                    next_point = np.zeros((1, 3 + self.x_dim + self.num_params))
                    if self.log_to_disk:
                        _, stored_point = self.pointstore.pop(loglstar)
                        if stored_point is not None:
                            next_point[0, :] = stored_point
                        else:
                            next_point[0, :] = -np.inf
                        use_point_stack = not self.pointstore.stack_empty
                    likes = next_point[:, 1]
                    samples = next_point[:, 3:3 + self.x_dim]
                    samplesv = next_point[:, 3 + self.x_dim:
                                          3 + self.x_dim + self.num_params]
                    ib = 0 if np.isfinite(likes[0]) else 1

                while ib >= len(samples):
                    ib = 0
                    nc = 0
                    u = region.sample(nsamples=ndraw, rng=self.rng)
                    nu = u.shape[0]
                    if nu == 0:
                        v = np.empty((0, self.x_dim))
                        logl = np.empty((0,))
                    else:
                        v = self.transform(u)
                        logl = self.loglike(v)
                        nc += nu
                        accepted = logl > loglstar
                        u = u[accepted, :]
                        v = v[accepted, :]
                        logl = logl[accepted]
                    samples = np.array(u)
                    samplesv = np.array(v)
                    likes = np.array(logl)
                    ncall += nc
                    if self.log:
                        for ui, vi, logli in zip(samples, samplesv, likes):
                            self.pointstore.add(
                                _listify([loglstar, logli, 0.0], ui, vi),
                                ncall)

                if likes[ib] > loglstar:
                    active_u[worst] = samples[ib, :]
                    active_v[worst] = samplesv[ib, :]
                    active_logl[worst] = likes[ib]
                    # keep the region tracking the live points
                    region.u[worst, :] = active_u[worst]
                    region.unormed[worst, :] = region.transformLayer.transform(
                        region.u[worst, :])
                    transformLayer.clusterids[worst] = 0
                    ib = ib + 1
                    break
                else:
                    ib = ib + 1

            logvol -= 1.0 / self.num_live_points
            logz_remain = np.max(active_logl) - it / self.num_live_points
            fraction_remain = np.logaddexp(logz, logz_remain) - logz

            if it % log_interval == 0 and self.log:
                sys.stdout.write(
                    'Z=%.1g+%.1g | Like=%.1g..%.1g | it/evals=%d/%d eff=%.4f%%  \r'
                    % (logz, logz_remain, loglstar, np.max(active_logl), it,
                       ncall, np.inf if ncall == 0 else it * 100 / ncall))
                sys.stdout.flush()
                ndraw = _next_pow2(max(128, min(16384, round((ncall + 1) / (it + 1)))))

            if fraction_remain < dlogz:
                break
            it = it + 1

        # final tail: add remaining live points
        logvol = -len(saved_v) / self.num_live_points - log(self.num_live_points)
        for i in range(self.num_live_points):
            logwt = logvol + active_logl[i]
            logz_new = np.logaddexp(logz, logwt)
            h = (exp(logwt - logz_new) * active_logl[i]
                 + exp(logz - logz_new) * (h + logz) - logz_new)
            logz = logz_new
            saved_u.append(np.array(active_u[i]))
            saved_v.append(np.array(active_v[i]))
            saved_logwt.append(logwt)
            saved_logl.append(active_logl[i])

        saved_u = np.array(saved_u)
        saved_v = np.array(saved_v)
        saved_wt = exp(np.array(saved_logwt) - logz)
        saved_logl = np.array(saved_logl)
        logzerr = np.sqrt(h / self.num_live_points)

        if self.log_to_disk:
            with open(os.path.join(self.logs['results'], 'final.csv'), 'w') as f:
                writer = csv.writer(f)
                writer.writerow(['niter', 'ncall', 'logz', 'logzerr', 'h'])
                writer.writerow([it + 1, ncall, logz, logzerr, h])
            self.pointstore.close()

        print()
        print("niter: {:d}\n ncall: {:d}\n nsamples: {:d}\n logz: {:6.3f} +/- {:6.3f}\n h: {:6.3f}"
              .format(it + 1, ncall, len(saved_v), logz, logzerr, h))

        self.results = dict(
            samples=resample_equal(saved_v, saved_wt / saved_wt.sum(),
                                   rstate=self.rng),
            ncall=ncall, niter=it, logz=logz, logzerr=logzerr,
            weighted_samples=dict(
                upoints=saved_u, points=saved_v, weights=saved_wt,
                logweights=saved_logwt, logl=saved_logl),
        )
        return self.results

    def print_results(self):
        """Print a summary of the evidence and parameter posteriors."""
        print()
        print('logZ = %(logz).3f +- %(logzerr).3f' % self.results)
        print()
        for i, p in enumerate(self.paramnames + self.derivedparamnames):
            v = self.results['samples'][:, i]
            sigma = v.std()
            med = v.mean()
            j = 3 if sigma == 0 else max(0, int(-np.floor(np.log10(sigma))) + 1)
            fmt = '%%.%df' % j
            print(('    %-20s' + fmt + " +- " + fmt) % (p, med, sigma))

    def plot(self):
        """Write a corner plot to the plots directory."""
        if self.log_to_disk:
            import matplotlib.pyplot as plt

            from .plot import cornerplot
            cornerplot(self.results)
            plt.savefig(os.path.join(self.logs['plots'], 'corner.pdf'),
                        bbox_inches='tight')
            plt.close()


def warmstart_from_similar_file(usample_filename, param_names, loglike,
                                transform, vectorized=False,
                                min_num_samples=50):
    """Build an accelerated auxiliary problem from a previous posterior.

    Loads ``chains/weighted_post_untransformed.txt`` of a previous run and
    deforms the prior around its posterior
    (:func:`ultranest_tpu.hotstart.get_auxiliary_contbox_parameterization`),
    so a fresh run needs far fewer iterations.

    Returns
    -------
    aux_param_names: list
    aux_loglikelihood: function
    aux_transform: function
    vectorized: bool
    """
    from .hotstart import get_auxiliary_contbox_parameterization
    try:
        with open(usample_filename) as f:
            old_param_names = f.readline().lstrip('#').strip().split()
            auxiliary_usamples = np.loadtxt(f)
    except IOError:
        warnings.warn('not hot-resuming, could not load file "%s"'
                      % usample_filename, stacklevel=2)
        return param_names, loglike, transform, vectorized

    ulogl = auxiliary_usamples[:, 1]
    uweights_full = auxiliary_usamples[:, 0] * np.exp(ulogl - ulogl.max())
    mask = uweights_full > 0
    uweights = uweights_full[mask]
    uweights /= uweights.sum()
    upoints = auxiliary_usamples[mask, 2:]

    nsamples = len(upoints)
    if nsamples < min_num_samples:
        raise ValueError('file "%s" has too few samples (%d) to hot-resume'
                         % (usample_filename, nsamples))
    if old_param_names != ['weight', 'logl'] + list(param_names):
        raise ValueError(
            'file "%s" has parameters %s, expected %s, cannot hot-resume.'
            % (usample_filename, old_param_names, param_names))

    return get_auxiliary_contbox_parameterization(
        param_names, loglike=loglike, transform=transform,
        vectorized=vectorized, upoints=upoints, uweights=uweights)


class ReactiveNestedSampler:
    """Nested sampler with reactive exploration strategy.

    Adaptively adds live points where the evidence / posterior / effective
    sample size targets require them. Storage & resume capable.
    """

    def __init__(self,
                 param_names,
                 loglike,
                 transform=None,
                 derived_param_names=[],
                 wrapped_params=None,
                 resume='subfolder',
                 run_num=None,
                 log_dir=None,
                 num_test_samples=2,
                 draw_multiple=True,
                 num_bootstraps=30,
                 vectorized=False,
                 ndraw_min=128,
                 ndraw_max=65536,
                 storage_backend='hdf5',
                 warmstart_max_tau=-1,
                 seed=None,
                 jax_loglike=None,
                 jax_transform=None,
                 mesh=None,
                 ):
        """Initialise nested sampler.

        Parameters
        ----------
        param_names: list of str
            parameter names; length sets dimensionality
        loglike: function
            vectorized log-likelihood (if *vectorized*)
        transform: function or None
            vectorized unit-cube-to-physical transform
        derived_param_names: list of str
            extra columns returned by transform
        log_dir: str or None
            output directory (None: no storage)
        resume: 'resume', 'resume-similar', 'overwrite' or 'subfolder'
            resume behaviour; 'resume-similar' salvages stored points from a
            modified likelihood up to *warmstart_max_tau* disorder
        run_num: int or None
            subfolder number
        wrapped_params: list of bools or None
            circular parameter flags
        num_test_samples: int
            number of random points for the startup sanity check
        vectorized: bool
            whether user functions accept arrays of points
        draw_multiple: bool
            adapt batch size between ndraw_min/ndraw_max with inefficiency
        ndraw_min, ndraw_max: int
            candidate batch bounds (kept as powers of two on device)
        num_bootstraps: int
            number of bootstrap rounds for logZ estimators and regions
        storage_backend: str or object
            'hdf5', 'tsv', 'csv' or a point-store instance
        warmstart_max_tau: float
            allowed live-point disorder for resume-similar (0..1)
        seed: int or None
            seed for the sampler's private RNG (None: global numpy RNG)
        jax_loglike: jax function or None
            jax-traceable batched log-likelihood. When given (together with
            *jax_transform* if a transform exists), candidate proposal,
            region filtering, transform and likelihood run fused in a
            single device dispatch per batch
            (:class:`ultranest_tpu.fused.FusedRegionSampler`), instead of
            the host-side path through *loglike*. *loglike* must still be
            provided (host fallback and resume verification).
        jax_transform: jax function or None
            jax-traceable batched prior transform matching *transform*
        mesh: jax.sharding.Mesh or None
            device mesh for sharded candidate generation (the TPU-native
            replacement for the reference's MPI data parallelism): each
            shard proposes and evaluates its own candidates with
            fold_in-derived RNG; results are allgathered and call counts
            psum-reduced. Requires *jax_loglike*.
        """
        self.paramnames = param_names
        x_dim = len(self.paramnames)

        self.sampler = 'reactive-nested'
        self.x_dim = x_dim
        self.transform_layer_class = LocalAffineLayer if x_dim > 1 else ScalingLayer
        self.derivedparamnames = derived_param_names
        self.num_bootstraps = int(num_bootstraps)
        num_derived = len(self.derivedparamnames)
        self.num_params = x_dim + num_derived
        if wrapped_params is None:
            self.wrapped_axes = []
        else:
            assert len(wrapped_params) == self.x_dim, (
                "wrapped_params has the number of entries:", wrapped_params,
                ", expected", self.x_dim)
            self.wrapped_axes = np.where(wrapped_params)[0]

        self.rng = np.random.RandomState(seed) if seed is not None else np.random

        # single-program by default; sharded likelihood evaluation is
        # provided by ultranest_tpu.parallel over a jax device mesh
        self.use_mpi = False
        self.comm = None
        self.mpi_size = 1
        self.mpi_rank = 0

        self.log = True
        self.log_to_disk = self.log and log_dir is not None
        self.log_to_pointstore = self.log_to_disk

        assert resume in (True, 'overwrite', 'subfolder', 'resume', 'resume-similar'), \
            "resume should be one of 'overwrite' 'subfolder', 'resume' or 'resume-similar'"
        append_run_num = resume == 'subfolder'
        resume_similar = resume == 'resume-similar'
        resume = resume in ('resume-similar', 'resume', True)

        if self.log and log_dir is not None:
            self.logs = make_run_dir(log_dir, run_num,
                                     append_run_num=append_run_num)
            log_dir = self.logs['run_dir']
        else:
            log_dir = None

        if self.log:
            self.logger = create_logger('ultranest_tpu', log_dir=log_dir)
            self.logger.debug(
                'ReactiveNestedSampler: dims=%d+%d, resume=%s, log_dir=%s, '
                'backend=%s, vectorized=%s, nbootstraps=%s, ndraw=%s..%s',
                x_dim, num_derived, resume, log_dir, storage_backend,
                vectorized, num_bootstraps, ndraw_min, ndraw_max)
        self.root = TreeNode(id=-1, value=-np.inf)

        self.pointpile = PointPile(self.x_dim, self.num_params)
        if self.log_to_pointstore:
            storage_filename = os.path.join(
                self.logs['results'], 'points.' + storage_backend
                if isinstance(storage_backend, str) else 'points.hdf5')
            storage_num_cols = 3 + self.x_dim + self.num_params
            if storage_backend == 'tsv':
                self.pointstore = TextPointStore(storage_filename, storage_num_cols)
                self.pointstore.delimiter = '\n'
            elif storage_backend == 'csv':
                self.pointstore = TextPointStore(storage_filename, storage_num_cols)
                self.pointstore.delimiter = ','
            elif storage_backend == 'hdf5':
                self.pointstore = HDF5PointStore(
                    storage_filename, storage_num_cols,
                    mode='a' if resume else 'w')
            else:
                self.pointstore = storage_backend
        else:
            self.pointstore = NullPointStore(3 + self.x_dim + self.num_params)
        self.ncall = self.pointstore.ncalls
        self.ncall_region = 0

        if not vectorized:
            if transform is not None:
                transform = vectorize(transform)
            loglike = vectorize(loglike)
            draw_multiple = False

        self.draw_multiple = draw_multiple
        self.ndraw_min = ndraw_min
        self.ndraw_max = ndraw_max
        self.build_tregion = transform is not None
        if not self._check_likelihood_function(transform, loglike, num_test_samples):
            assert self.log_to_disk
            if resume_similar and self.log_to_disk:
                assert storage_backend == 'hdf5', \
                    'resume-similar is only supported for HDF5 files'
                assert 0 <= warmstart_max_tau <= 1, \
                    'warmstart_max_tau parameter needs to be set to a value between 0 and 1'
                self.pointstore.close()
                del self.pointstore
                if self.log:
                    self.logger.info(
                        'trying to salvage points from previous, different run ...')
                resume_from_similar_file(
                    log_dir, x_dim, loglike, transform,
                    ndraw=ndraw_min if vectorized else 1,
                    max_tau=warmstart_max_tau, verbose=False)
                self.pointstore = HDF5PointStore(
                    os.path.join(self.logs['results'], 'points.hdf5'),
                    3 + self.x_dim + self.num_params, mode='a' if resume else 'w')
            elif resume:
                raise Exception(
                    "Cannot resume because loglikelihood function changed, "
                    "unless resume=resume-similar. To start from scratch, "
                    "delete '%s'." % log_dir)
        self._set_likelihood_function(transform, loglike, num_test_samples)
        self.stepsampler = None

        self.fused_sampler = None
        self._fused_method = 0  # index into fused.METHOD_CYCLE
        if jax_loglike is not None and len(self.wrapped_axes) == 0:
            from .fused import FusedRegionSampler
            fused_seed = seed if seed is not None else np.random.randint(2**31)
            self.fused_sampler = FusedRegionSampler(
                jax_loglike, jax_transform, self.x_dim, seed=fused_seed,
                mesh=mesh)

    def _check_likelihood_function(self, transform, loglike, num_test_samples):
        """Sanity-check the user functions; verify resume consistency.

        Returns whether the most recently stored point still yields the
        same likelihood value.
        """
        num_resume_test_samples = 0
        if num_test_samples and not self.pointstore.stack_empty:
            num_resume_test_samples = 1
            num_test_samples -= 1

        if num_test_samples > 0:
            u = self.rng.uniform(size=(num_test_samples, self.x_dim))
            p = transform(u) if transform is not None else u
            assert np.shape(p) == (num_test_samples, self.num_params), (
                "Error in transform function: returned shape is %s, expected %s"
                % (np.shape(p), (num_test_samples, self.num_params)))
            logl = loglike(p)
            assert np.logical_and(u > 0, u < 1).all(), (
                "Error in transform function: u was modified!")
            assert np.shape(logl) == (num_test_samples,), (
                "Error in loglikelihood function: returned shape is %s, expected %s"
                % (np.shape(logl), (num_test_samples,)))
            assert np.isfinite(logl).all(), (
                "Error in loglikelihood function: returned non-finite number: "
                "%s for input u=%s p=%s" % (logl, u, p))

        if not self.pointstore.stack_empty and num_resume_test_samples > 0:
            _, lastrow = self.pointstore.stack[-1]
            assert len(lastrow) == 3 + self.x_dim + self.num_params, (
                "Cannot resume: problem has different dimensionality",
                len(lastrow), (2, self.x_dim, self.num_params))
            lastL = lastrow[1]
            lastu = lastrow[3:3 + self.x_dim]
            u = lastu.reshape((1, -1))
            lastp = lastrow[3 + self.x_dim:3 + self.x_dim + self.num_params]
            if self.log:
                self.logger.debug(
                    "Testing resume consistency: %s: u=%s -> p=%s -> L=%s ",
                    lastrow, lastu, lastp, lastL)
            p = transform(u) if transform is not None else u
            if not np.allclose(p.flatten(), lastp) and self.log:
                self.logger.warning(
                    "Trying to resume from previous run, but transform function "
                    "gives different result: %s gave %s, now %s",
                    lastu, lastp, p.flatten())
            assert np.allclose(p.flatten(), lastp), (
                "Cannot resume because transform function changed. "
                "To start from scratch, delete '%s'." % self.logs['run_dir'])
            logl = loglike(p).flatten()[0]
            if not np.isclose(logl, lastL) and self.log:
                self.logger.warning(
                    "Trying to resume from previous run, but likelihood "
                    "function gives different result: %s gave %s, now %s",
                    lastu.flatten(), lastL, logl)
            return np.isclose(logl, lastL)
        return True

    def _set_likelihood_function(self, transform, loglike, num_test_samples,
                                 make_safe=False):
        """Store the user functions (optionally wrapped to be forgiving)."""

        def safe_loglike(x):
            """Evaluate likelihood; clip non-finite values to -1e100."""
            x = np.asarray(x)
            if len(x.shape) == 1:
                assert x.shape[0] == self.x_dim
                x = np.expand_dims(x, 0)
            logl = loglike(x)
            if len(logl.shape) == 0:
                logl = np.expand_dims(logl, 0)
            logl[np.logical_not(np.isfinite(logl))] = -1e100
            return logl

        self.loglike = safe_loglike if make_safe else loglike

        if transform is None:
            self.transform = lambda x: x
        elif make_safe:
            def safe_transform(x):
                """Transform, coercing a single point into a batch."""
                x = np.asarray(x)
                if len(x.shape) == 1:
                    assert x.shape[0] == self.x_dim
                    x = np.expand_dims(x, 0)
                return transform(x)
            self.transform = safe_transform
        else:
            self.transform = transform

        lims = np.ones((2, self.x_dim))
        lims[0, :] = 1e-6
        lims[1, :] = 1 - 1e-6
        self.transform_limits = self.transform(lims).transpose()
        self.volfactor = vol_prefactor(self.x_dim)

    def _widen_nodes(self, weighted_parents, weights, nnodes_needed,
                     update_interval_ncall):
        """Ensure parents carry *nnodes_needed* parallel arcs; plan children.

        Returns a dict mapping node id -> minimum number of children to
        maintain.
        """
        ndone = len(weighted_parents)
        if ndone == 0:
            if self.log:
                self.logger.info('No parents, so widening roots')
            self._widen_roots(nnodes_needed)
            return {}

        # preferentially select nodes with few forks: they carry most weight
        p = 1.0 / np.array(weights)
        if (p == p[0]).all():
            parents = weighted_parents
        else:
            i = self.rng.choice(len(weighted_parents), size=nnodes_needed,
                                p=p / p.sum())
            parents = [weighted_parents[ii] for ii in i]

        del weighted_parents, weights
        parents.sort(key=operator.attrgetter('value'))
        Lmin = parents[0].value
        if np.isinf(Lmin):
            # parents sampled from the whole prior: widen roots instead
            if self.log:
                self.logger.info('parent value is -inf, so widening roots')
            self._widen_roots(nnodes_needed)
            return {}

        nsamples = int(np.ceil((nnodes_needed - ndone) / len(parents)))
        if self.log:
            self.logger.info('Will add %d live points (x%d) at L=%.1g ...',
                             nnodes_needed - ndone, nsamples, Lmin)
        target_min_num_children = {}
        for n in parents:
            orign = target_min_num_children.get(n.id, len(n.children))
            target_min_num_children[n.id] = orign + nsamples
        return target_min_num_children

    def _widen_roots_beyond_initial_plateau(self, nroots, num_warn, num_stop):
        """Widen roots, over-provisioning across any initial plateau.

        Repeats :meth:`_widen_roots` until `nroots`-1 points exceed the
        lowest loglikelihood value (Fowlie+2020 plateau handling), bounded
        by *num_stop*.
        """
        nroots_needed = nroots
        user_has_been_warned = False
        while True:
            self._widen_roots(nroots_needed)
            Ls = np.array([node.value for node in self.root.children])
            Lmin = np.min(Ls)
            if self.log and nroots_needed > num_warn and not user_has_been_warned:
                self.logger.warning(
                    "The loglikelihood has a large plateau with L=%g. "
                    "ultranest can handle this correctly, by discarding live "
                    "points with the same loglikelihood (arxiv:2005.08602, "
                    "arxiv:2010.13884), but you can avoid this by making the "
                    "loglikelihood increase towards the good region. "
                    "The initial number of live points has grown beyond %d "
                    "and will be capped at %d.", Lmin, num_warn, num_stop)
                user_has_been_warned = True
            if nroots_needed >= num_stop:
                break
            P = (Ls == Lmin).sum()
            if 1 < P < len(Ls) and len(Ls) - P + 1 < nroots:
                if self.log:
                    self.logger.debug(
                        'Found plateau of %d/%d initial points at L=%g. '
                        'Avoid this by a continuously increasing loglikelihood '
                        'towards good regions.', P, nroots_needed, Lmin)
                nroots_needed = min(num_stop, nroots_needed + (P - 1))
            else:
                break

    def _widen_roots(self, nroots):
        """Ensure the root has *nroots* children (replay store, then sample prior)."""
        if self.log and len(self.root.children) > 0:
            self.logger.info(
                'Widening roots to %d live points (have %d already) ...',
                nroots, len(self.root.children))
        nnewroots = nroots - len(self.root.children)
        if nnewroots <= 0:
            return

        prev_u, prev_v, prev_logl, prev_rowid = [], [], [], []
        if self.log and self.use_point_stack:
            for _ in range(nnewroots):
                rowid, row = self.pointstore.pop(-np.inf)
                if row is None:
                    break
                prev_logl.append(row[1])
                prev_u.append(row[3:3 + self.x_dim])
                prev_v.append(row[3 + self.x_dim:3 + self.x_dim + self.num_params])
                prev_rowid.append(rowid)

        prev_u = np.array(prev_u)
        prev_v = np.array(prev_v)
        prev_logl = np.array(prev_logl)
        num_live_points_missing = nnewroots - len(prev_logl)

        assert num_live_points_missing >= 0
        if self.log and num_live_points_missing > 0:
            self.logger.info('Sampling %d live points from prior ...',
                             num_live_points_missing)
        if num_live_points_missing > 0:
            self.ncall += num_live_points_missing
            active_u = self.rng.uniform(
                size=(num_live_points_missing, self.x_dim))
            active_v = self.transform(active_u)
            active_logl = self.loglike(active_v)
            assert active_logl.shape == (num_live_points_missing,), (
                active_logl.shape, num_live_points_missing)

            if self.log_to_pointstore:
                for i in range(num_live_points_missing):
                    self.pointstore.add(_listify(
                        [-np.inf, active_logl[i], 0.0],
                        active_u[i, :], active_v[i, :]), 1)

            if len(prev_u) > 0:
                active_u = np.concatenate((prev_u, active_u))
                active_v = np.concatenate((prev_v, active_v))
                active_logl = np.concatenate((prev_logl, active_logl))
            assert active_u.shape == (nnewroots, self.x_dim)
            assert active_v.shape == (nnewroots, self.num_params)
            assert active_logl.shape == (nnewroots,)
        else:
            active_u, active_v, active_logl = prev_u, prev_v, prev_logl

        roots = [self.pointpile.make_node(logl, u, p)
                 for u, p, logl in zip(active_u, active_v, active_logl)]
        if len(active_u) > 4:
            self.build_tregion = not is_affine_transform(active_u, active_v)
        self.root.children += roots

    def _adaptive_strategy_advice(self, Lmin, parallel_values, main_iterator,
                                  minimal_widths, frac_remain, Lepsilon):
        """Return the (Llo, Lhi) interval needing more sampling (nan if done)."""
        Ls = parallel_values.copy()
        Ls.sort()
        Lmax = Ls[-1]
        Lmin = Ls[0]

        # all live points equal within tolerance: stop
        if Lmax - Lmin < Lepsilon:
            return np.nan, np.nan

        # likelihood level that would contribute frac_remain of the integral
        logZmax = main_iterator.logZremain
        Lnext = logZmax - (main_iterator.logVolremaining + log(frac_remain)) \
            - log(len(Ls))
        L1 = Ls[1] if len(Ls) > 1 else Ls[0]
        Lmax1 = np.median(Ls)
        Lnext = max(min(Lnext, Lmax1), L1)

        if main_iterator.logZremain > main_iterator.logZ:
            return Lmin, Lnext
        if main_iterator.remainder_fraction > frac_remain:
            return Lmin, Lnext
        return np.nan, np.nan

    def _find_strategy(self, saved_logl, main_iterator, dlogz, dKL, min_ess):
        """Ask each strategy where more exploration is needed.

        Returns (Nlive_min, (Llo_KL, Lhi_KL), (Llo_ess, Lhi_ess)).
        """
        saved_logl = np.asarray(saved_logl)
        logw = np.asarray(main_iterator.logweights) \
            + saved_logl.reshape((-1, 1)) - main_iterator.all_logZ
        ref_logw = logw[:, 0].reshape((-1, 1))
        other_logw = logw[:, 1:]

        Llo_ess = np.inf
        Lhi_ess = -np.inf
        w = exp(ref_logw.flatten())
        w /= w.sum()
        ess = len(w) / (1.0 + ((len(w) * w - 1)**2).sum() / len(w))
        if ess < min_ess:
            samples = self.rng.choice(len(w), p=w, size=min_ess)
            Llo_ess = saved_logl[samples].min()
            Lhi_ess = saved_logl[samples].max()
        if self.log and Lhi_ess > Llo_ess:
            self.logger.info(
                "Effective samples strategy wants to improve: %.2f..%.2f "
                "(ESS = %.1f, need >%d)", Llo_ess, Lhi_ess, ess, min_ess)
        elif self.log and min_ess > 0:
            self.logger.info(
                "Effective samples strategy satisfied (ESS = %.1f, need >%d)",
                ess, min_ess)

        # KL divergence of bootstrapped posteriors vs the main estimator
        with np.errstate(invalid='ignore'):
            KL = np.where(np.isfinite(other_logw),
                          exp(other_logw) * (other_logw - ref_logw), 0)
        KLtot = KL.sum(axis=0)
        dKLtot = np.abs(KLtot - KLtot.mean())
        p = np.where(KL > 0, KL, 0)
        p /= p.sum(axis=0).reshape((1, -1))

        Llo_KL = np.inf
        Lhi_KL = -np.inf
        for pi, dKLi, logwi in zip(p.transpose(), dKLtot, other_logw):
            if dKLi > dKL:
                ilo, ihi = _get_cumsum_range(pi, 1.0 / 400)
                # snap to the nearest finite-weight iteration in this instance
                ilos = np.where(np.isfinite(logwi[:ilo]))[0]
                ihis = np.where(np.isfinite(logwi[ihi:]))[0]
                ilo2 = ilos[-1] if len(ilos) > 0 else 0
                ihi2 = (ihi + ihis[0]) if len(ihis) > 0 else -1
                Llo_KL = min(Llo_KL, saved_logl[ilo2])
                Lhi_KL = max(Lhi_KL, saved_logl[ihi2])

        if self.log and Lhi_KL > Llo_KL:
            self.logger.info(
                "Posterior uncertainty strategy wants to improve: %.2f..%.2f "
                "(KL: %.2f+-%.2f nat, need <%.2f nat)",
                Llo_KL, Lhi_KL, KLtot.mean(), dKLtot.max(), dKL)
        elif self.log:
            self.logger.info(
                "Posterior uncertainty strategy is satisfied "
                "(KL: %.2f+-%.2f nat, need <%.2f nat)",
                KLtot.mean(), dKLtot.max(), dKL)

        Nlive_min = 0
        deltalogZ = np.abs(main_iterator.all_logZ[1:] - main_iterator.logZ)

        tail_fraction = w[np.asarray(main_iterator.istail)].sum() / w.sum()
        logzerr_tail = logaddexp(
            log(tail_fraction) + main_iterator.logZ,
            main_iterator.logZ) - main_iterator.logZ
        maxlogzerr = max(main_iterator.logZerr, deltalogZ.max(),
                         main_iterator.logZerr_bs)
        if maxlogzerr > dlogz:
            if self.log and logzerr_tail > maxlogzerr:
                self.logger.info(
                    "logz error is dominated by tail. Decrease frac_remain "
                    "to make progress.")
            # conservative floor from total iteration count
            niter_max = len(saved_logl)
            Nlive_min = int(np.ceil(niter_max**0.5 / dlogz))
            if self.log:
                self.logger.debug(
                    "  conservative estimate says at least %d live points "
                    "are needed to reach dlogz goal", Nlive_min)

            # sharper estimate: back out the nlive sequence from the widths
            itmax = self.rng.choice(len(w), p=w)
            logweights = np.array(main_iterator.logweights[:itmax])
            with np.errstate(divide='ignore', invalid='ignore'):
                widthratio = 1 - np.exp(logweights[1:, 0] - logweights[:-1, 0])
                nlive = 1.0 / np.log(
                    (1 - np.sqrt(1 - 4 * widthratio)) / (2 * widthratio))
                nlive[~np.logical_and(np.isfinite(nlive), nlive > 1)] = 1

            nlive_sets, niter = np.unique(nlive.astype(int), return_counts=True)
            if self.log and len(niter) > 0:
                self.logger.debug(
                    "  number of live points vary between %.0f and %.0f, "
                    "most (%d/%d iterations) have %d",
                    nlive.min(), nlive.max(), niter.max(), itmax,
                    nlive_sets[niter.argmax()])
            for nlive_floor in nlive_sets:
                nlive_adjusted = np.where(nlive_sets < nlive_floor,
                                          nlive_floor, nlive_sets)
                deltalogZ_expected = (niter / nlive_adjusted**2.0).sum()**0.5
                if deltalogZ_expected < dlogz:
                    Nlive_min = int(nlive_floor)
                    if self.log:
                        self.logger.debug(
                            "  at least %d live points are needed to reach "
                            "dlogz goal", Nlive_min)
                    break

        if self.log and Nlive_min > 0:
            self.logger.info(
                "Evidence uncertainty strategy wants %d minimum live points "
                "(dlogz from %.2f to %.2f, need <%s)",
                Nlive_min, deltalogZ.mean(), deltalogZ.max(), dlogz)
        elif self.log:
            self.logger.info(
                "Evidence uncertainty strategy is satisfied (dlogz=%.2f, need <%s)",
                (main_iterator.logZerr_bs**2 + logzerr_tail**2)**0.5, dlogz)
        if self.log:
            self.logger.info(
                '  logZ error budget: single: %.2f bs:%.2f tail:%.2f '
                'total:%.2f required:<%.2f',
                main_iterator.logZerr, main_iterator.logZerr_bs, logzerr_tail,
                (main_iterator.logZerr_bs**2 + logzerr_tail**2)**0.5, dlogz)

        return Nlive_min, (Llo_KL, Lhi_KL), (Llo_ess, Lhi_ess)

    def _refill_samples(self, Lmin, ndraw, nit):
        """Draw one batch of region candidates and evaluate the likelihood.

        The batch size is bucketed to powers of two so jit caches of the
        device membership kernels stay warm.
        """
        nc = 0
        ndraw = _next_pow2(max(ndraw, 16))
        if self.fused_sampler is not None:
            # single fused device dispatch: draw + filter + transform + L
            from .fused import METHOD_CYCLE
            u, v, logl, nc, ndrawn = self.fused_sampler(
                self.region, Lmin, ndraw, tregion=self.tregion,
                method=METHOD_CYCLE[self._fused_method])
            if len(u) == 0 or nc < max(1, ndrawn // 200):
                # proposal strategy starved: rotate to the next one
                self._fused_method = (self._fused_method + 1) \
                    % len(METHOD_CYCLE)
            self.ncall_region += ndrawn
            return u, v, logl, nc, 0
        u = self.region.sample(nsamples=ndraw, rng=self.rng)
        assert np.logical_and(u > 0, u < 1).all(), u
        nu = u.shape[0]
        if nu == 0:
            v = np.empty((0, self.num_params))
            logl = np.empty((0,))
            accepted = np.empty(0, dtype=bool)
        else:
            if nu > 1 and not self.draw_multiple:
                nu = 1
                u = u[:1, :]

            v = self.transform(u)
            logl = np.ones(nu) * -np.inf

            if self.tregion is not None:
                # pre-filter with the wrapping ellipsoid in p-space
                accepted = self.tregion.inside(v)
                nt = accepted.sum()
            else:
                accepted = np.ones(nu, dtype=bool)
                nt = nu

            if nt > 0:
                logl[accepted] = self.loglike(v[accepted, :])
                nc += nt
            accepted = logl > Lmin

        if not self.sampling_slow_warned and nit * ndraw >= 100000 and nit > 20:
            warning_message = (
                "Sampling from region seems inefficient (%d/%d accepted in "
                "iteration %d). To improve efficiency, modify the "
                "transformation so that the current live points are "
                "ellipsoidal, or use a stepsampler, or set frac_remain to a "
                "lower number (e.g., 0.5) to terminate earlier."
                % (accepted.sum(), ndraw, nit))
            if self.log_to_disk:
                debug_filename = os.path.join(
                    self.logs['extra'], 'sampling-stuck-it%d' % nit)
                np.savez(debug_filename + '.npz',
                         u=self.region.u, unormed=self.region.unormed,
                         maxradiussq=self.region.maxradiussq,
                         sample_u=u, sample_v=v, sample_logl=logl)
                np.savetxt(debug_filename + '.csv', self.region.u, delimiter=',')
            warnings.warn(warning_message, stacklevel=2)
            logl_region = self.loglike(self.transform(self.region.u))
            if (logl_region == Lmin).all():
                raise ValueError(
                    "Region cannot sample a higher point. "
                    "All remaining live points have the same value.")
            if not (logl_region > Lmin).any():
                raise ValueError(
                    "Region cannot sample a higher point. "
                    "Perhaps you are resuming from a different problem? "
                    "Delete the output files and start again.")
            self.sampling_slow_warned = True

        self.ncall_region += ndraw
        return u[accepted, :], v[accepted, :], logl[accepted], nc, 0

    def _create_point(self, Lmin, ndraw, active_u, active_values):
        """Draw a new point above likelihood threshold *Lmin*."""
        if self.stepsampler is None and self.fused_sampler is None \
                and self._region_membership_unchecked:
            # sanity check, once per region rebuild: membership can only
            # change when the region does, and each check costs a device
            # round-trip (42 ms over a remote-accelerator link)
            self._region_membership_unchecked = False
            assert self.region.inside(active_u).any(), (
                "None of the live points satisfies the current region!",
                self.region.maxradiussq, self.region.u, active_u)

        nit = 0
        while True:
            ib = self.ib
            if ib >= len(self.samples) and self.use_point_stack:
                # replay from the point store first (this is how resume works)
                next_point = np.zeros((1, 3 + self.x_dim + self.num_params)) * np.nan
                if self.log_to_pointstore:
                    _, stored_point = self.pointstore.pop(Lmin)
                    if stored_point is not None:
                        next_point[0, :] = stored_point
                    else:
                        next_point[0, :] = -np.inf
                    self.use_point_stack = not self.pointstore.stack_empty

                self.likes = next_point[:, 1]
                self.samples = next_point[:, 3:3 + self.x_dim]
                self.samplesv = next_point[:, 3 + self.x_dim:
                                           3 + self.x_dim + self.num_params]
                ib = 0 if np.isfinite(self.likes[0]) else 1

            use_stepsampler = self.stepsampler is not None
            while ib >= len(self.samples):
                ib = 0
                if use_stepsampler:
                    u, v, logl, nc = self.stepsampler.__next__(
                        self.region,
                        transform=self.transform, loglike=self.loglike,
                        Lmin=Lmin, us=active_u, Ls=active_values,
                        ndraw=ndraw, tregion=self.tregion)
                    quality = self.stepsampler.nsteps
                else:
                    u, v, logl, nc, quality = self._refill_samples(
                        Lmin, ndraw, nit)
                nit += 1

                if logl is None:
                    u = np.empty((0, self.x_dim))
                    v = np.empty((0, self.num_params))
                    logl = np.empty((0,))
                elif np.asarray(u).ndim == 1:
                    assert np.logical_and(u > 0, u < 1).all(), u
                    u = np.asarray(u).reshape((1, self.x_dim))
                    v = np.asarray(v).reshape((1, self.num_params))
                    logl = np.asarray(logl).reshape((1,))

                self.samples = u
                self.samplesv = v
                self.likes = logl
                self.ncall += nc

                if self.log_to_pointstore:
                    for ui, vi, logli in zip(self.samples, self.samplesv,
                                             self.likes):
                        self.pointstore.add(
                            _listify([Lmin, logli, quality], ui, vi),
                            self.ncall)

            if self.likes[ib] > Lmin:
                u = self.samples[ib, :]
                assert np.logical_and(u > 0, u < 1).all(), u
                p = self.samplesv[ib, :]
                logl = self.likes[ib]
                if self.fused_sampler is not None \
                        and not self.use_point_stack \
                        and len(self.samples) >= 8 \
                        and len(self.samples) - ib <= len(self.samples) // 4:
                    # buffer running low: launch the next proposal batch
                    # now so the device computes while the host consumes
                    # the remainder
                    from .fused import METHOD_CYCLE
                    self.fused_sampler.prefetch(
                        self.region, Lmin, ndraw, tregion=self.tregion,
                        method=METHOD_CYCLE[self._fused_method])
                if self.fused_sampler is not None:
                    # the device filter ran in f32; re-evaluate the selected
                    # point on the host in f64. Quantized likelihoods would
                    # create spurious ties (plateau detections) in the tree.
                    # Not counted in ncall: the point was already counted as
                    # a device member evaluation.
                    logl = float(self.loglike(p.reshape((1, -1)))[0])
                    if not logl > Lmin:
                        self.ib = ib + 1
                        continue
                self.ib = ib + 1
                return u, p, logl
            else:
                self.ib = ib + 1

    def _update_region(self, active_u, active_node_ids,
                       bootstrap_rootids=None, active_rootids=None,
                       nbootstraps=30, minvol=0.0, active_p=None):
        """Build a new region (and p-space wrapping ellipsoid) from live points.

        Regions are bootstrapped on device; a new region is accepted only if
        all live points are inside, the volume shrank (or acceptance is
        forced) and the clustering is sensible — the hysteresis preventing
        reconnection of dying modes.

        Returns True if an update was made.
        """
        assert nbootstraps > 0
        updated = False
        if self.region is None:
            self.transformLayer = self.transform_layer_class(
                wrapped_dims=self.wrapped_axes)
            self.transformLayer.optimize(active_u, active_u, minvol=minvol)
            self.region = self.region_class(active_u, self.transformLayer)
            self.region_nodes = active_node_ids.copy()
            assert self.region.maxradiussq is None
            _update_region_bootstrap(self.region, nbootstraps, minvol,
                                     None, 1, rng=self.rng)
            self.region.create_ellipsoid(minvol=minvol)
            updated = True

        assert self.transformLayer is not None
        need_accept = False

        if self.region.maxradiussq is None:
            # radius was invalidated (leaf removal): recompute with the
            # current layer, then re-match the old cluster assignment
            oldu = self.region.u
            self.region.u = active_u
            self.region_nodes = active_node_ids.copy()
            self.region.set_transformLayer(self.transformLayer)
            _update_region_bootstrap(self.region, nbootstraps, minvol,
                                     None, 1, rng=self.rng)

            # re-match old cluster assignments in one device dispatch
            # (points near several old clusters stay unassigned)
            oldt = self.transformLayer.transform(oldu)
            clusterids = match_clusters(
                oldt, self.transformLayer.clusterids,
                self.region.unormed, self.region.maxradiussq)
            self.transformLayer.clusterids = clusterids
            need_accept = (self.transformLayer.clusterids == 0).any()
            updated = True
            assert len(self.region.u) == len(self.transformLayer.clusterids)
            self.region.create_ellipsoid(minvol=minvol)

        assert len(self.region.u) == len(self.transformLayer.clusterids)
        with warnings.catch_warnings(), np.errstate(all='raise'):
            try:
                nextTransformLayer = self.transformLayer.create_new(
                    active_u, self.region.maxradiussq, minvol=minvol)
                assert not (nextTransformLayer.clusterids == 0).any()
                _, cluster_sizes = np.unique(nextTransformLayer.clusterids,
                                             return_counts=True)
                smallest_cluster = cluster_sizes.min()
                if self.log and smallest_cluster == 1:
                    self.logger.debug(
                        "clustering found some stray points [need_accept=%s] %s",
                        need_accept,
                        np.unique(nextTransformLayer.clusterids,
                                  return_counts=True))

                nextregion = self.region_class(active_u, nextTransformLayer)
                assert np.isfinite(nextregion.unormed).all()

                if self.log and not nextTransformLayer.nclusters < 20:
                    self.logger.info(
                        "Found a lot of clusters: %d (%d with >1 members)",
                        nextTransformLayer.nclusters, (cluster_sizes > 1).sum())

                r, f = _update_region_bootstrap(nextregion, nbootstraps,
                                                minvol, None, 1, rng=self.rng)
                nextregion.create_ellipsoid(minvol=minvol)

                # live points healthy: no duplicates, full-rank covariance
                self.live_points_healthy = \
                    len(active_u) > self.x_dim and \
                    np.all(np.sum(active_u[1:] != active_u[0], axis=0)
                           > self.x_dim) and \
                    np.linalg.matrix_rank(nextregion.ellipsoid_cov) == self.x_dim

                assert (nextregion.u == active_u).all()
                # the radius part of inside() is trivially true for the
                # defining points (each is inside its own ball), so only
                # the ellipsoid test can fail — host numpy, no dispatch
                good_region = nextregion.inside_ellipsoid(active_u).all()
                if not good_region and self.log:
                    self.logger.debug(
                        "Proposed region is inconsistent (maxr=%g,enlarge=%g) "
                        "and will be skipped.", r, f)

                # guard against pathological clustering (all singletons)
                sensible_clustering = \
                    nextTransformLayer.nclusters < len(nextregion.u) \
                    and cluster_sizes.max() >= nextregion.u.shape[1]

                # hysteresis: require volume shrinkage unless forced
                if good_region and \
                        (need_accept or nextregion.estimate_volume()
                         <= self.region.estimate_volume()) \
                        and sensible_clustering:
                    self.region = nextregion
                    self.transformLayer = self.region.transformLayer
                    self.region_nodes = active_node_ids.copy()
                    updated = True
                    assert not (self.transformLayer.clusterids == 0).any()

            except Warning:
                if self.log:
                    self.logger.debug("not updating region", exc_info=True)
            except FloatingPointError:
                if self.log:
                    self.logger.debug("not updating region", exc_info=True)
            except np.linalg.LinAlgError:
                if self.log:
                    self.logger.debug("not updating region", exc_info=True)

        assert len(self.region.u) == len(self.transformLayer.clusterids)

        if active_p is None or not self.build_tregion:
            self.tregion = None
        else:
            try:
                with np.errstate(invalid='raise'):
                    tregion = WrappingEllipsoid(active_p)
                    f = tregion.compute_enlargement(
                        nbootstraps=max(1, nbootstraps), rng=self.rng)
                    tregion.enlarge = f
                    tregion.create_ellipsoid()
                    self.tregion = tregion
            except FloatingPointError:
                if self.log:
                    self.logger.debug("not updating t-ellipsoid", exc_info=True)
                self.tregion = None
            except np.linalg.LinAlgError:
                if self.log:
                    self.logger.debug("not updating t-ellipsoid", exc_info=True)
                self.tregion = None

        self._region_membership_unchecked = True
        return updated

    def _expand_nodes_before(self, Lmin, nnodes_needed, update_interval_ncall):
        """Ensure *nnodes_needed* parallel arcs exist before *Lmin*."""
        self.pointstore.reset()
        parents, weights = find_nodes_before(self.root, Lmin)
        target_min_num_children = self._widen_nodes(
            parents, weights, nnodes_needed, update_interval_ncall)
        if len(parents) == 0:
            Llo = -np.inf
        else:
            Llo = min(n.value for n in parents)
        return Llo, Lmin, target_min_num_children

    def _should_node_be_expanded(self, it, Llo, Lhi, minimal_widths_sequence,
                                 target_min_num_children, node,
                                 parallel_values, max_ncalls, max_iters,
                                 live_points_healthy):
        """Decide whether to sample a new child above this node's value."""
        Lmin = node.value
        nlive = len(parallel_values)

        if not (Lmin <= Lhi and Llo <= Lhi):
            return False

        if not live_points_healthy:
            if self.log:
                self.logger.debug(
                    "not expanding, because live points are linearly dependent")
            return False

        if it > 0:
            if max_ncalls is not None and self.ncall >= max_ncalls:
                return False
            if max_iters is not None and it >= max_iters:
                return False

        # in a plateau, only shrink (Fowlie+2020)
        if (Lmin == parallel_values).sum() > 1:
            if self.log:
                self.logger.debug(
                    "Plateau detected at L=%e, not replacing live point." % Lmin)
            return False

        while Lmin > minimal_widths_sequence[0][0]:
            minimal_widths_sequence.pop(0)

        if self.region is None:
            minimal_width_clusters = 0
        else:
            _, cluster_sizes = np.unique(
                self.region.transformLayer.clusterids, return_counts=True)
            nclusters = (cluster_sizes > 1).sum()
            minimal_width_clusters = self.cluster_num_live_points * nclusters

        minimal_width = max(minimal_widths_sequence[0][1],
                            minimal_width_clusters)

        nmin = target_min_num_children.get(node.id, 1) \
            if target_min_num_children else 1
        expand_node = len(node.children) < nmin
        # the first iteration must expand, otherwise H is never initialized
        too_wide = nlive > minimal_width and it > 0

        return expand_node and not too_wide

    def run(self,
            update_interval_volume_fraction=0.8,
            update_interval_ncall=None,
            log_interval=None,
            show_status=True,
            viz_callback='auto',
            dlogz=0.5,
            dKL=0.5,
            frac_remain=0.01,
            Lepsilon=0.001,
            min_ess=400,
            max_iters=None,
            max_ncalls=None,
            max_num_improvement_loops=-1,
            min_num_live_points=400,
            cluster_num_live_points=40,
            insertion_test_zscore_threshold=4,
            insertion_test_window=10,
            region_class=MLFriends,
            widen_before_initial_plateau_num_warn=10000,
            widen_before_initial_plateau_num_max=50000,
            ):
        r"""Run until the target convergence criteria are fulfilled.

        Parameters
        ----------
        update_interval_volume_fraction: float
            rebuild the region when the volume shrank by this fraction
        update_interval_ncall: int
            unused (kept for API compatibility)
        log_interval: int
            status-line update interval in iterations
        show_status: bool
            show a live status line
        viz_callback: function, 'auto' or False
            live view callback on region rebuilds
        dlogz: float
            target evidence uncertainty (std between bootstrapped logZ)
        dKL: float
            target posterior uncertainty (KL divergence, nat)
        frac_remain: float
            terminate when this fraction of the integral is in the remainder
        Lepsilon: float
            tolerance for considering live points equal
        min_ess: int
            target number of effective posterior samples
        max_iters: int
            maximum number of iterations
        max_ncalls: int
            maximum number of likelihood evaluations
        max_num_improvement_loops: int
            bound on reactive improvement loops
        min_num_live_points: int
            minimum live points throughout the run
        cluster_num_live_points: int
            minimum live points per detected cluster
        insertion_test_zscore_threshold: float
            threshold for the insertion-rank U-test (inf disables)
        insertion_test_window: int
            iterations between insertion test resets
        region_class: MLFriends, RobustEllipsoidRegion or SimpleRegion
            region construction algorithm
        widen_before_initial_plateau_num_warn: int
            warn when plateau-driven root widening exceeds this
        widen_before_initial_plateau_num_max: int
            hard cap on plateau-driven root widening

        Returns
        -------
        results: dict
            posterior samples, logz(+errors), ess, H, posterior summaries,
            weighted samples, maximum likelihood point,
            insertion_order_MWW_test (see reference
            integrator.py:2388-2457 for the full schema).
        """
        for _result in self.run_iter(
                update_interval_volume_fraction=update_interval_volume_fraction,
                update_interval_ncall=update_interval_ncall,
                log_interval=log_interval,
                dlogz=dlogz, dKL=dKL,
                Lepsilon=Lepsilon, frac_remain=frac_remain,
                min_ess=min_ess, max_iters=max_iters,
                max_ncalls=max_ncalls,
                max_num_improvement_loops=max_num_improvement_loops,
                min_num_live_points=min_num_live_points,
                cluster_num_live_points=cluster_num_live_points,
                show_status=show_status,
                viz_callback=viz_callback,
                insertion_test_window=insertion_test_window,
                insertion_test_zscore_threshold=insertion_test_zscore_threshold,
                region_class=region_class,
                widen_before_initial_plateau_num_warn=widen_before_initial_plateau_num_warn,
                widen_before_initial_plateau_num_max=widen_before_initial_plateau_num_max,
                ):
            if self.log:
                self.logger.debug("did a run_iter pass!")
        if self.log:
            self.logger.info("done iterating.")
        return self.results

    def run_iter(self,
                 update_interval_volume_fraction=0.8,
                 update_interval_ncall=None,
                 log_interval=None,
                 dlogz=0.5,
                 dKL=0.5,
                 frac_remain=0.01,
                 Lepsilon=0.001,
                 min_ess=400,
                 max_iters=None,
                 max_ncalls=None,
                 max_num_improvement_loops=-1,
                 min_num_live_points=400,
                 cluster_num_live_points=40,
                 show_status=True,
                 viz_callback='auto',
                 insertion_test_window=10000,
                 insertion_test_zscore_threshold=2,
                 region_class=MLFriends,
                 widen_before_initial_plateau_num_warn=10000,
                 widen_before_initial_plateau_num_max=50000,
                 ):
        """Iterate towards convergence, yielding results after each pass.

        Parameters are described in :meth:`run`.
        """
        if -np.log1p(frac_remain) > dlogz:
            raise ValueError(
                "To achieve the desired logz accuracy, set frac_remain to a "
                "value much smaller than %s (currently: %s)"
                % (exp(-dlogz) - 1, frac_remain))

        # error is ~ sqrt(iterations)/Nlive: enforce a sensible minimum
        if min_num_live_points < 1000**0.5 / dlogz:
            min_num_live_points = int(np.ceil(1000**0.5 / dlogz))
            if self.log:
                self.logger.info(
                    "To achieve the desired logz accuracy, min_num_live_points "
                    "was increased to %d" % min_num_live_points)

        if self.log_to_pointstore:
            if len(self.pointstore.stack) > 0:
                self.logger.info("Resuming from %d stored points",
                                 len(self.pointstore.stack))
            self.use_point_stack = not self.pointstore.stack_empty
        else:
            self.use_point_stack = False

        assert min_num_live_points >= cluster_num_live_points, (
            'min_num_live_points(%d) cannot be less than '
            'cluster_num_live_points(%d)'
            % (min_num_live_points, cluster_num_live_points))
        self.min_num_live_points = min_num_live_points
        self.cluster_num_live_points = cluster_num_live_points
        self.sampling_slow_warned = False
        self.build_tregion = True
        self.region_class = region_class
        update_interval_volume_log_fraction = log(update_interval_volume_fraction)

        if viz_callback == 'auto':
            viz_callback = get_default_viz_callback()

        self._widen_roots_beyond_initial_plateau(
            min_num_live_points,
            widen_before_initial_plateau_num_warn,
            widen_before_initial_plateau_num_max)

        Llo, Lhi = -np.inf, np.inf
        Lmax = -np.inf
        strategy_stale = True
        minimal_widths = []
        target_min_num_children = {}
        improvement_it = 0

        assert max_iters is None or max_iters > 0, (
            "Invalid value for max_iters: %s." % max_iters)
        assert max_ncalls is None or max_ncalls > 0, (
            "Invalid value for max_ncalls: %s." % max_ncalls)

        self.results = None

        while True:
            roots = self.root.children
            nroots = len(roots)

            if update_interval_ncall is None:
                update_interval_ncall = nroots

            if log_interval is None:
                log_interval = max(1, round(0.1 * nroots))
            else:
                log_interval = round(log_interval)
                if log_interval < 1:
                    raise ValueError("log_interval must be >= 1")

            explorer = BreadthFirstIterator(roots)
            main_iterator = MultiCounter(
                nroots=len(roots),
                nbootstraps=max(1, self.num_bootstraps),
                random=False, check_insertion_order=False, rng=self.rng)
            main_iterator.Lmax = max(Lmax, max(n.value for n in roots))
            insertion_test = UniformOrderAccumulator()
            insertion_test_runs = []
            insertion_test_quality = np.inf
            insertion_test_direction = 0

            self.transformLayer = None
            self.region = None
            self.tregion = None
            self._region_membership_unchecked = True
            self.live_points_healthy = True
            it_at_first_region = 0
            self.ib = 0
            self.samples = []
            if self.draw_multiple:
                ndraw = self.ndraw_min
            else:
                ndraw = 40
            self.pointstore.reset()
            if self.log_to_pointstore:
                self.use_point_stack = not self.pointstore.stack_empty
            else:
                self.use_point_stack = False

            if self.log and (np.isfinite(Llo) or np.isfinite(Lhi)):
                self.logger.info(
                    "Exploring (in particular: L=%.2f..%.2f) ...", Llo, Lhi)
            region_sequence = []
            minimal_widths_sequence = _sequentialize_width_sequence(
                minimal_widths, self.min_num_live_points)
            if self.log:
                self.logger.debug('minimal_widths_sequence: %s',
                                  minimal_widths_sequence)

            saved_nodeids = []
            saved_logl = []
            it = 0
            ncall_at_run_start = self.ncall
            ncall_region_at_run_start = self.ncall_region
            next_update_interval_volume = 1
            last_status = time.time()

            # consume live points in likelihood order, across all roots
            while True:
                next_node = explorer.next_node()
                if next_node is None:
                    break
                rootid, node, (_, active_rootids, active_values,
                               active_node_ids) = next_node
                assert not isinstance(rootid, float)
                self.Lmin = Lmin = node.value

                if strategy_stale or not (Lmin <= Lhi) or \
                        not np.isfinite(Lhi) or (active_values == Lmin).all():
                    Llo, Lhi = self._adaptive_strategy_advice(
                        Lmin, active_values, main_iterator,
                        minimal_widths, frac_remain, Lepsilon=Lepsilon)
                    strategy_stale = Lhi - Llo < max(Lepsilon, 0.01)

                expand_node = self._should_node_be_expanded(
                    it, Llo, Lhi, minimal_widths_sequence,
                    target_min_num_children, node, active_values,
                    max_ncalls, max_iters, self.live_points_healthy)

                region_fresh = False
                if expand_node:
                    nlive = len(active_node_ids)
                    region_update_due = main_iterator.logVolremaining \
                        < next_update_interval_volume
                    # gathering the live-point coordinate arrays costs two
                    # (nlive, dim) fancy-index copies; only do it on
                    # iterations that actually consume them (region
                    # updates, sampler dispatches) — buffered iterations
                    # just pop a prepared sample
                    sampler = self.fused_sampler or self.stepsampler
                    needs_live = getattr(sampler, 'needs_live_points', None)
                    if region_update_due or needs_live is None or \
                            self.tregion is not None or needs_live(Lmin):
                        active_u = self.pointpile.getu(active_node_ids)
                        active_p = self.pointpile.getp(active_node_ids)
                    else:
                        active_u = active_p = None
                    # refresh the region when the volume shrank enough
                    if region_update_due:
                        if self.region is None:
                            it_at_first_region = it
                        region_fresh = self._update_region(
                            active_u=active_u, active_p=active_p,
                            active_node_ids=active_node_ids,
                            active_rootids=active_rootids,
                            bootstrap_rootids=main_iterator.rootids[1:, ],
                            nbootstraps=self.num_bootstraps,
                            minvol=exp(main_iterator.logVolremaining))

                        if region_fresh and self.stepsampler is not None:
                            self.stepsampler.region_changed(active_values,
                                                            self.region)
                        # buffered candidates stay valid across region
                        # rebuilds: they were drawn uniformly above Lmin
                        # from an envelope that contained the constrained
                        # set, and insertion re-checks L > current Lmin.
                        # (Round-1 discarded them here, wasting 2.4x
                        # evaluations on eggbox; the mode imbalance seen
                        # then was the f32/f64 likelihood quantization
                        # issue, fixed separately.)

                        _, cluster_sizes = np.unique(
                            self.region.transformLayer.clusterids,
                            return_counts=True)
                        nclusters = (cluster_sizes > 1).sum()
                        region_sequence.append(
                            (Lmin, nlive, nclusters, np.max(active_values)))

                        next_update_interval_volume = \
                            main_iterator.logVolremaining \
                            + update_interval_volume_log_fraction

                        if self.log and viz_callback:
                            viz_callback(
                                points=dict(u=active_u, p=active_p,
                                            logl=active_values),
                                info=dict(
                                    it=it, ncall=self.ncall,
                                    logz=main_iterator.logZ,
                                    logz_remain=main_iterator.logZremain,
                                    logvol=main_iterator.logVolremaining,
                                    paramnames=self.paramnames + self.derivedparamnames,
                                    paramlims=self.transform_limits,
                                    order_test_correlation=insertion_test_quality,
                                    order_test_direction=insertion_test_direction,
                                    stepsampler_info=self.stepsampler.get_info_dict()
                                    if hasattr(self.stepsampler, 'get_info_dict')
                                    else {}),
                                region=self.region,
                                transformLayer=self.transformLayer,
                                region_fresh=region_fresh)
                        if self.log:
                            self.pointstore.flush()

                    if nlive < cluster_num_live_points * nclusters \
                            and improvement_it < max_num_improvement_loops:
                        # found a cluster underpopulated: widen there
                        if self.log:
                            self.logger.info(
                                "Found %d clusters, but only have %d live "
                                "points, want %d.",
                                self.region.transformLayer.nclusters, nlive,
                                cluster_num_live_points * nclusters)
                        break

                    # sample a point above Lmin
                    u, p, L = self._create_point(
                        Lmin=Lmin, ndraw=ndraw, active_u=active_u,
                        active_values=active_values)
                    child = self.pointpile.make_node(L, u, p)
                    main_iterator.Lmax = max(main_iterator.Lmax, L)
                    if np.isfinite(insertion_test_zscore_threshold) and nlive > 1:
                        insertion_test.add(int((active_values < L).sum()), nlive)
                        if abs(insertion_test.zscore) > insertion_test_zscore_threshold:
                            insertion_test_runs.append(insertion_test.N)
                            insertion_test_quality = insertion_test.N
                            insertion_test_direction = np.sign(insertion_test.zscore)
                            insertion_test.reset()
                        elif insertion_test.N > insertion_test_window:
                            insertion_test_quality = np.inf
                            insertion_test_direction = 0
                            insertion_test.reset()

                    # identify which point (from the region build) is replaced
                    worst = np.where(self.region_nodes == node.id)[0]
                    self.region_nodes[worst] = child.id
                    # the region follows the live points between rebuilds;
                    # the ellipsoid center is re-meaned incrementally
                    nworst = len(worst)
                    if nworst:
                        u_old_sum = self.region.u[worst].sum(axis=0)
                        self.region.u[worst] = u
                        self.region.unormed[worst] = \
                            self.region.transformLayer.transform(u)
                        self.region.ellipsoid_center = \
                            self.region.ellipsoid_center + \
                            (nworst * u - u_old_sum) / len(self.region.u)
                    if self.tregion:
                        self.tregion.update_center(np.mean(active_p, axis=0))
                    self.transformLayer.clusterids[worst] = 0

                    node.children.append(child)

                    if self.log and (region_fresh or it % log_interval == 0
                                     or time.time() > last_status + 0.1):
                        last_status = time.time()
                        ncall_region_here = (self.ncall_region
                                             - ncall_region_at_run_start)
                        ncall_here = self.ncall - ncall_at_run_start
                        it_here = it - it_at_first_region

                        if show_status:
                            if Lmin < -1e8:
                                txt = 'Z=%.1g(%.2f%%) | Like=%.2g..%.2g [%.4g..%.4g]%s| it/evals=%d/%d eff=%.4f%% N=%d \r'
                            elif Llo < -1e8:
                                txt = 'Z=%.1f(%.2f%%) | Like=%.2f..%.2f [%.4g..%.4g]%s| it/evals=%d/%d eff=%.4f%% N=%d \r'
                            else:
                                txt = 'Z=%.1f(%.2f%%) | Like=%.2f..%.2f [%.4f..%.4f]%s| it/evals=%d/%d eff=%.4f%% N=%d \r'
                            sys.stdout.write(txt % (
                                main_iterator.logZ,
                                100 * (1 - main_iterator.remainder_fraction),
                                Lmin, main_iterator.Lmax, Llo, Lhi,
                                '*' if strategy_stale else ' ', it, self.ncall,
                                np.inf if ncall_here == 0
                                else it_here * 100 / ncall_here,
                                nlive))
                            sys.stdout.flush()
                        self.logger.debug(
                            'iteration=%d, ncalls=%d, regioncalls=%d, ndraw=%d, '
                            'logz=%.2f, remainder_fraction=%.4f%%, Lmin=%.2f, '
                            'Lmax=%.2f',
                            it, self.ncall, self.ncall_region, ndraw,
                            main_iterator.logZ,
                            100 * main_iterator.remainder_fraction, Lmin,
                            main_iterator.Lmax)

                        if self.draw_multiple:
                            # proposals per successful iteration, smoothed
                            sampling_inefficiency = \
                                (ncall_region_here + 1) / (it_here + 1)
                            ndraw_next = 0.04 * sampling_inefficiency + ndraw * 0.96
                            ndraw = max(self.ndraw_min,
                                        min(self.ndraw_max, round(ndraw_next),
                                            ndraw * 100))
                            if sampling_inefficiency > 100000 \
                                    and it >= it_at_first_region + 10:
                                ncall_at_run_start = self.ncall
                                it_at_first_region = it
                                ncall_region_at_run_start = self.ncall_region
                else:
                    # don't count non-working iterations towards efficiency
                    it_at_first_region += 1

                saved_nodeids.append(node.id)
                saved_logl.append(Lmin)

                main_iterator.passing_node(rootid, node, active_rootids,
                                           active_values)
                if len(node.children) == 0 and self.region is not None:
                    # nlive shrank: radius invalid, force a region rebuild
                    self.region.maxradiussq = None
                    next_update_interval_volume = 1

                it += 1
                explorer.expand_children_of(rootid, node)

            if self.log:
                self.logger.info("Explored until L=%.1g  ", node.value)
            self.pointstore.flush()
            self._update_results(main_iterator, saved_logl, saved_nodeids)
            yield self.results

            if max_ncalls is not None and self.ncall >= max_ncalls:
                if self.log:
                    self.logger.info(
                        'Reached maximum number of likelihood calls (%d > %d)...',
                        self.ncall, max_ncalls)
                break

            improvement_it += 1
            if max_num_improvement_loops >= 0 and \
                    improvement_it > max_num_improvement_loops:
                if self.log:
                    self.logger.info(
                        'Reached maximum number of improvement loops.')
                break

            if ncall_at_run_start == self.ncall and improvement_it > 1:
                if self.log:
                    self.logger.info(
                        'No changes made. Probably the strategy was to '
                        'explore in the remainder, but it is irrelevant '
                        'already; try decreasing frac_remain.')
                break

            Lmax = main_iterator.Lmax
            if len(region_sequence) > 0:
                Lmin, nlive, nclusters, Lhi = region_sequence[-1]
                nnodes_needed = cluster_num_live_points * nclusters
                if nlive < nnodes_needed:
                    Llo, _, target_min_num_children_new = \
                        self._expand_nodes_before(
                            Lmin, nnodes_needed,
                            update_interval_ncall or nlive)
                    target_min_num_children.update(target_min_num_children_new)
                    minimal_widths.append((Llo, Lhi, nnodes_needed))
                    Llo, Lhi = -np.inf, np.inf
                    continue

            if self.log:
                self.logger.info('  logZ = %.4g +- %.4g',
                                 main_iterator.logZ_bs,
                                 main_iterator.logZerr_bs)

            saved_logl = np.asarray(saved_logl)
            dlogz_min_num_live_points, (Llo_KL, Lhi_KL), (Llo_ess, Lhi_ess) = \
                self._find_strategy(saved_logl, main_iterator, dlogz=dlogz,
                                    dKL=dKL, min_ess=min_ess)
            Llo = min(Llo_ess, Llo_KL)
            Lhi = max(Lhi_ess, Lhi_KL)
            # numerical safety when all likelihood values are nearly equal
            Lhi = min(Lhi, saved_logl.max() - 0.001)

            if dlogz_min_num_live_points > self.min_num_live_points:
                self.min_num_live_points = dlogz_min_num_live_points
                self._widen_roots_beyond_initial_plateau(
                    self.min_num_live_points,
                    widen_before_initial_plateau_num_warn,
                    widen_before_initial_plateau_num_max)
            elif Llo <= Lhi:
                parents, parent_weights = find_nodes_before(self.root, Llo)
                _, width = count_tree_between(self.root.children, Llo, Lhi)
                nnodes_needed = width * 2
                if self.log:
                    self.logger.info(
                        'Widening from %d to %d live points before L=%.1g...',
                        len(parents), nnodes_needed, Llo)
                if len(parents) == 0:
                    Llo = -np.inf
                else:
                    Llo = min(n.value for n in parents)
                self.pointstore.reset()
                target_min_num_children.update(self._widen_nodes(
                    parents, parent_weights, nnodes_needed,
                    update_interval_ncall))
                minimal_widths.append((Llo, Lhi, nnodes_needed))
            else:
                break

    def _update_results(self, main_iterator, saved_logl, saved_nodeids):
        if self.log:
            self.logger.info('Likelihood function evaluations: %d', self.ncall)

        results = combine_results(saved_logl, saved_nodeids, self.pointpile,
                                  main_iterator, mpi_comm=None)
        results['ncall'] = int(self.ncall)
        results['paramnames'] = self.paramnames + self.derivedparamnames
        results['logzerr_single'] = (
            main_iterator.all_H[0] / self.min_num_live_points) ** 0.5

        sequence, results2 = logz_sequence(self.root, self.pointpile,
                                           random=True,
                                           check_insertion_order=True)
        results['insertion_order_MWW_test'] = \
            results2['insertion_order_MWW_test']

        results_simple = dict(results)
        weighted_samples = results_simple.pop('weighted_samples')
        samples = results_simple.pop('samples')
        saved_wt0 = weighted_samples['weights']
        saved_u = weighted_samples['upoints']
        saved_v = weighted_samples['points']

        if self.log_to_disk:
            if self.log:
                self.logger.info("Writing samples and results to disk ...")
            np.savetxt(
                os.path.join(self.logs['chains'], 'equal_weighted_post.txt'),
                samples,
                header=' '.join(self.paramnames + self.derivedparamnames),
                comments='')
            np.savetxt(
                os.path.join(self.logs['chains'], 'weighted_post.txt'),
                np.hstack((saved_wt0.reshape((-1, 1)),
                           np.reshape(saved_logl, (-1, 1)), saved_v)),
                header=' '.join(['weight', 'logl'] + self.paramnames
                                + self.derivedparamnames),
                comments='')
            np.savetxt(
                os.path.join(self.logs['chains'],
                             'weighted_post_untransformed.txt'),
                np.hstack((saved_wt0.reshape((-1, 1)),
                           np.reshape(saved_logl, (-1, 1)), saved_u)),
                header=' '.join(['weight', 'logl'] + self.paramnames
                                + self.derivedparamnames),
                comments='')

            with open(os.path.join(self.logs['info'], 'results.json'), 'w') as f:
                json.dump(results_simple, f, indent=4,
                          default=lambda x: x.tolist()
                          if isinstance(x, np.ndarray)
                          else float(x) if isinstance(x, np.floating)
                          else int(x))

            np.savetxt(
                os.path.join(self.logs['info'], 'post_summary.csv'),
                [[results['posterior'][k][i] for i in range(self.num_params)
                  for k in ('mean', 'stdev', 'median', 'errlo', 'errup')]],
                header=','.join(
                    ['"{0}_mean","{0}_stdev","{0}_median","{0}_errlo","{0}_errup"'.format(k)
                     for k in self.paramnames + self.derivedparamnames]),
                delimiter=',', comments='')

            keys = 'logz', 'logzerr', 'logvol', 'nlive', 'logl', 'logwt', 'insert_order'
            np.savetxt(
                os.path.join(self.logs['chains'], 'run.txt'),
                np.hstack(tuple([np.reshape(sequence[k], (-1, 1))
                                 for k in keys])),
                header=' '.join(keys), comments='')
            if self.log:
                self.logger.info("Writing samples and results to disk ... done")

        self.results = results
        self.run_sequence = sequence

    def store_tree(self):
        """Store the exploration tree to results/tree.hdf5."""
        if self.log_to_disk:
            dump_tree(os.path.join(self.logs['results'], 'tree.hdf5'),
                      self.root.children, self.pointpile)

    def print_results(self, use_unicode=True):
        """Print a summary of evidence and parameter posteriors."""
        if self.log:
            print()
            print('logZ = %(logz).3f +- %(logzerr).3f' % self.results)
            print('  single instance: logZ = %(logz_single).3f +- %(logzerr_single).3f' % self.results)
            print('  bootstrapped   : logZ = %(logz_bs).3f +- %(logzerr_bs).3f' % self.results)
            print('  tail           : logZ = +- %(logzerr_tail).3f' % self.results)
            print('insert order U test : converged: %(converged)s correlation: %(independent_iterations)s iterations'
                  % self.results['insertion_order_MWW_test'])
            if self.stepsampler and hasattr(self.stepsampler, 'print_diagnostic'):
                self.stepsampler.print_diagnostic()
            print()
            for i, p in enumerate(self.paramnames + self.derivedparamnames):
                v = self.results['samples'][:, i]
                sigma = v.std()
                med = v.mean()
                if sigma == 0:
                    j = 3
                else:
                    j = max(0, int(-np.floor(np.log10(sigma))) + 1)
                fmt = '%%.%df' % j
                try:
                    if not use_unicode:
                        raise UnicodeEncodeError(
                            'ascii', '', 0, 1, 'unicode disabled')
                    ' ▁▂▃▄▅▆▇██'.encode(sys.stdout.encoding)
                    H, edges = np.histogram(v, bins=40)
                    lo, hi = edges[0], edges[-1]
                    step = edges[1] - lo
                    lo = max(self.transform_limits[i, 0], lo - 2 * step)
                    hi = min(self.transform_limits[i, 1], hi + 2 * step)
                    H, edges = np.histogram(v, bins=np.linspace(lo, hi, 40))
                    lo, hi = edges[0], edges[-1]
                    dist = ''.join([' ▁▂▃▄▅▆▇██'[i]
                                    for i in np.ceil(H * 7 / H.max()).astype(int)])
                    print('    %-20s: %-6s│%s│%-6s    %s +- %s'
                          % (p, fmt % lo, dist, fmt % hi, fmt % med, fmt % sigma))
                except Exception:
                    print(('    %-20s' + fmt + " +- " + fmt) % (p, med, sigma))
            print()

    def plot(self):
        """Make corner, run and trace plots."""
        self.plot_corner()
        self.plot_run()
        self.plot_trace()

    def plot_corner(self):
        """Write a corner plot to the plots directory."""
        import matplotlib.pyplot as plt

        from .plot import cornerplot
        if self.log:
            self.logger.debug('Making corner plot ...')
        cornerplot(self.results, logger=self.logger if self.log else None)
        if self.log_to_disk:
            plt.savefig(os.path.join(self.logs['plots'], 'corner.pdf'),
                        bbox_inches='tight')
            plt.close()
            self.logger.debug('Making corner plot ... done')

    def plot_trace(self):
        """Write a trace plot to the plots directory."""
        import matplotlib.pyplot as plt

        from .plot import traceplot
        if self.log:
            self.logger.debug('Making trace plot ... ')
        paramnames = self.paramnames + self.derivedparamnames
        traceplot(results=self.run_sequence, labels=paramnames)
        if self.log_to_disk:
            plt.savefig(os.path.join(self.logs['plots'], 'trace.pdf'),
                        bbox_inches='tight')
            plt.close()
            self.logger.debug('Making trace plot ... done')

    def plot_run(self):
        """Write a run diagnostic plot to the plots directory."""
        import matplotlib.pyplot as plt

        from .plot import runplot
        if self.log:
            self.logger.debug('Making run plot ... ')
        runplot(results=self.run_sequence, logplot=True)
        if self.log_to_disk:
            plt.savefig(os.path.join(self.logs['plots'], 'run.pdf'),
                        bbox_inches='tight')
            plt.close()
            self.logger.debug('Making run plot ... done')


def read_file(log_dir, x_dim, num_bootstraps=20, random=True, verbose=False,
              check_insertion_order=True):
    """Read a stored run and recompute the logZ sequence.

    Parameters
    ----------
    log_dir: str
        run directory containing ``results/points.hdf5``
    x_dim: int
        dimensionality
    num_bootstraps: int
        number of bootstrap estimators
    random: bool
        randomize volume estimates
    verbose: bool
        show progress
    check_insertion_order: bool
        run the MWW insertion-order convergence test

    Returns
    -------
    sequence: dict
        per-iteration logz/logzerr/logvol/samples_n/logwt/logl arrays
    final: dict
        results dictionary as from :meth:`ReactiveNestedSampler.run`
    """
    import h5py
    filepath = os.path.join(log_dir, 'results', 'points.hdf5')
    with h5py.File(filepath, 'r') as fileobj:
        _, ncols = fileobj['points'].shape
        num_params = ncols - 3 - x_dim
        points = fileobj['points'][:]
    stack = list(enumerate(points))

    pointpile = PointPile(x_dim, num_params)

    def pop(Lmin):
        """Find the first stored row matching threshold *Lmin*."""
        for i, (idx, next_row) in enumerate(stack):
            row_Lmin = next_row[0]
            L = next_row[1]
            if row_Lmin <= Lmin and L > Lmin:
                idx, row = stack.pop(i)
                return idx, row
        return None, None

    roots = []
    while True:
        _, row = pop(-np.inf)
        if row is None:
            break
        logl = row[1]
        u = row[3:3 + x_dim]
        v = row[3 + x_dim:3 + x_dim + num_params]
        roots.append(pointpile.make_node(logl, u, v))

    root = TreeNode(id=-1, value=-np.inf, children=roots)

    def onNode(node, main_iterator):
        """Attach all stored children of *node* during replay."""
        while True:
            _, row = pop(node.value)
            if row is None:
                break
            logl = row[1]
            u = row[3:3 + x_dim]
            v = row[3 + x_dim:3 + x_dim + num_params]
            child = pointpile.make_node(logl, u, v)
            assert logl > node.value, (logl, node.value)
            main_iterator.Lmax = max(main_iterator.Lmax, logl)
            node.children.append(child)

    return logz_sequence(root, pointpile, nbootstraps=num_bootstraps,
                         random=random, onNode=onNode, verbose=verbose,
                         check_insertion_order=check_insertion_order)
