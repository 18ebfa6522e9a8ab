# noqa: D400 D205
"""
Warm start: accelerate a fresh run with a previous posterior
------------------------------------------------------------

Deforms the unit-cube prior around a known posterior (from an earlier or
similar run) and undoes the deformation with a correction weight carried
as an extra derived parameter — so a fresh run needs far fewer
iterations. Based on Petrosyan & Handley (2022, arxiv:2212.01760);
TPU-native rebuild of `/root/reference/ultranest/hotstart.py`.

All deformations are host-side closures wrapped around the user functions
(cold path); the accelerated run itself goes through the standard device
pipeline.
"""

import numpy as np

from .utils import resample_equal, vectorize

__all__ = [
    'get_auxiliary_problem', 'get_extended_auxiliary_problem',
    'get_extended_auxiliary_independent_problem',
    'compute_quantile_intervals', 'compute_quantile_intervals_refined',
    'get_auxiliary_contbox_parameterization', 'reuse_samples',
]


def get_auxiliary_problem(loglike, transform, ctr, invcov,
                          enlargement_factor, df=1):
    """Build an auxiliary problem from a posterior gaussian approximation.

    The prior is deformed into a d-dimensional Student-t centered on the
    posterior; the likelihood divides out the deformation density.

    Parameters
    ----------
    loglike, transform: functions
        original model functions (non-vectorized)
    ctr: array
        posterior center in u-space
    invcov: array
        inverse posterior covariance in u-space
    enlargement_factor: float
        scale inflation (sqrt(ndim) works for gaussian-like posteriors)
    df: float
        Student-t degrees of freedom (>=1)

    Returns
    -------
    aux_loglike, aux_aftertransform: functions
    """
    import scipy.stats
    ndim, = ctr.shape
    assert invcov.shape == (ndim, ndim)
    assert df >= 1, ('Degrees of freedom must be above 1', df)

    eigval, eigvec = np.linalg.eigh(invcov)
    rotation_matrix = np.dot(eigvec,
                             enlargement_factor * np.diag(1.0 / np.sqrt(eigval)))
    rv_auxiliary1d = scipy.stats.t(df)

    def aux_rotator(coords):
        return ctr + np.dot(coords, rotation_matrix)

    def aux_loglikelihood(u):
        coords = rv_auxiliary1d.ppf(u)
        x = aux_rotator(coords)
        if not (x > 0).all() or not (x < 1).all():
            return -1e300
        loglike_total = rv_auxiliary1d.logpdf(coords).sum()
        return loglike(transform(x)) - loglike_total

    def aux_aftertransform(u):
        return transform(aux_rotator(rv_auxiliary1d.ppf(u)))

    return aux_loglikelihood, aux_aftertransform


def get_extended_auxiliary_problem(loglike, transform, ctr, invcov,
                                   enlargement_factor, df=1):
    """Like :func:`get_auxiliary_problem`, carrying the correction weight.

    The returned transform outputs d+1 parameters: the physical parameters
    plus the log correction weight; the likelihood adds the weight.
    """
    import scipy.stats
    ndim, = ctr.shape
    assert invcov.shape == (ndim, ndim)
    assert df >= 1, ('Degrees of freedom must be above 1', df)

    eigval, eigvec = np.linalg.eigh(invcov)
    rotation_matrix = np.dot(eigvec,
                             enlargement_factor * np.diag(1.0 / np.sqrt(eigval)))
    rv_auxiliary1d = scipy.stats.t(df)
    weight_ref = rv_auxiliary1d.logpdf(0) * ndim

    def aux_transform(u):
        coords = rv_auxiliary1d.ppf(u)
        x = ctr + np.dot(rotation_matrix, coords)
        if (x > 0).all() and (x < 1).all():
            weight = -rv_auxiliary1d.logpdf(coords).sum() + weight_ref
        else:
            weight = -1e101
            x = u * 0 + 0.5
        return np.append(transform(x), weight)

    def aux_loglikelihood(x):
        x_actual = x[:-1]
        weight = x[-1]
        if -1e100 < weight < 1e100:
            return loglike(x_actual) + weight - weight_ref
        return -1e300

    return aux_loglikelihood, aux_transform


def get_extended_auxiliary_independent_problem(loglike, transform, ctr, err,
                                               df=1):
    """Axis-independent Student-t deformation with correction weight.

    Parameters as :func:`get_extended_auxiliary_problem` with per-axis
    standard deviations *err* instead of a covariance.
    """
    import scipy.stats
    ndim, = np.shape(ctr)
    assert np.shape(err) == (ndim,)
    assert df >= 1, ('Degrees of freedom must be above 1', df)

    rv_aux = scipy.stats.t(df, ctr, err)
    # clip the auxiliary distribution to the unit cube
    aux_lo = rv_aux.cdf(0)
    aux_hi = rv_aux.cdf(1)
    aux_w = aux_hi - aux_lo
    weight_ref = rv_aux.logpdf(ctr).sum()

    def aux_transform(u):
        x = rv_aux.ppf(u * aux_w + aux_lo)
        weight = -rv_aux.logpdf(x).sum() + weight_ref
        return np.append(transform(x), weight)

    def aux_loglikelihood(x):
        x_actual = x[:-1]
        weight = x[-1]
        if -1e100 < weight < 1e100:
            return loglike(x_actual) + weight - weight_ref
        return -1e300

    return aux_loglikelihood, aux_transform


def compute_quantile_intervals(steps, upoints, uweights):
    """Per-axis weighted quantile envelopes at each level in *steps*.

    Returns (ulos, uhis) of shape (len(steps)+1, ndim); the last row is
    the full unit interval.
    """
    ndim = upoints.shape[1]
    nboxes = len(steps)
    ulos = np.empty((nboxes + 1, ndim))
    uhis = np.empty((nboxes + 1, ndim))
    order = np.argsort(upoints, axis=0)
    for i in range(ndim):
        ui = upoints[order[:, i], i]
        c = np.cumsum(uweights[order[:, i]])
        for j, pthresh in enumerate(steps):
            sel = np.logical_and(c >= pthresh, c <= 1 - pthresh)
            usel = ui[sel]
            ulos[j, i] = usel.min()
            uhis[j, i] = usel.max()
    ulos[-1] = 0
    uhis[-1] = 1
    return ulos, uhis


def compute_quantile_intervals_refined(steps, upoints, uweights,
                                       logsteps_max=20):
    """Quantile envelopes with log-spaced relaxation towards the unit cube.

    Returns (ulos, uhis, uinterpspace): envelopes of shape (M, ndim) and
    the interpolation abscissae (length M).
    """
    nboxes = len(steps)
    ulos_orig, uhis_orig = compute_quantile_intervals(steps, upoints, uweights)

    smallest_axis_width = np.min(uhis_orig[-2, :] - ulos_orig[-2, :])
    logsteps = min(logsteps_max,
                   int(np.ceil(-np.log10(max(1e-100, smallest_axis_width)))))

    weights = np.logspace(-logsteps, 0, logsteps + 1).reshape((-1, 1))
    ulos_new = ulos_orig[nboxes - 1, :].reshape((1, -1)) * (1 - weights)
    uhis_new = uhis_orig[nboxes - 1, :].reshape((1, -1)) * (1 - weights) \
        + 1 * weights

    ulos = np.vstack((ulos_orig[:-1, :], ulos_new))
    uhis = np.vstack((uhis_orig[:-1, :], uhis_new))
    assert (ulos[-1, :] == 0).all()
    assert (uhis[-1, :] == 1).all()

    uinterpspace = np.ones(nboxes + logsteps + 1)
    uinterpspace[:nboxes + 1] = np.linspace(0, 1, nboxes + 1)
    uinterpspace[nboxes:] = np.linspace(uinterpspace[nboxes - 1], 1,
                                        logsteps + 2)[1:]
    return ulos, uhis, uinterpspace


def get_auxiliary_contbox_parameterization(param_names, loglike, transform,
                                           upoints, uweights,
                                           vectorized=False):
    """Deform the prior with per-axis quantile boxes of a previous posterior.

    Each axis is compressed towards the posterior quantile envelope; an
    extra parameter ``u[-1]`` interpolates between the tightest box and
    the full cube, and its volume correction is returned as the derived
    parameter ``aux_logweight`` (added to the likelihood).

    Returns
    -------
    aux_param_names, aux_loglike, aux_transform, vectorized
    """
    upoints = np.asarray(upoints)
    assert upoints.ndim == 2, (
        'expected 2d array for upoints, got shape: %s' % str(upoints.shape))
    mask = np.logical_and(upoints > 0, upoints < 1).all(axis=1)
    assert np.all(mask), (
        'upoints must be between 0 and 1, have:', upoints[~mask, :])
    steps = 10.0 ** -(1.0 * np.arange(1, 8, 2))
    nsamples, ndim = upoints.shape
    assert nsamples > 10
    ulos, uhis, uinterpspace = compute_quantile_intervals_refined(
        steps, upoints, uweights)

    aux_param_names = list(param_names) + ['aux_logweight']

    def _deform(u2d):
        """Vectorized box deformation of (n, ndim+1) points."""
        t = u2d[:, -1]
        umod = np.empty((len(u2d), ndim))
        logvol = np.zeros(len(u2d))
        for i in range(ndim):
            ulo_here = np.interp(t, uinterpspace, ulos[:, i])
            uhi_here = np.interp(t, uinterpspace, uhis[:, i])
            umod[:, i] = ulo_here + (uhi_here - ulo_here) * u2d[:, i]
            logvol += np.log(uhi_here - ulo_here)
        return umod, logvol

    def aux_transform(u):
        assert u.shape == (ndim + 1,)
        umod, logvol = _deform(u.reshape((1, -1)))
        return np.append(transform(umod[0]), logvol[0])

    def aux_transform_vectorized(u):
        assert u.shape[1] == ndim + 1
        umod, logvol = _deform(u)
        return np.hstack((transform(umod), logvol.reshape((-1, 1))))

    def aux_loglikelihood(x):
        return loglike(x[:-1]) + x[-1]

    def aux_loglikelihood_vectorized(x):
        return loglike(x[:, :-1]) + x[:, -1]

    if vectorized:
        return (aux_param_names, aux_loglikelihood_vectorized,
                aux_transform_vectorized, vectorized)
    return aux_param_names, aux_loglikelihood, aux_transform, vectorized


def reuse_samples(param_names, loglike, points, logl, logw=None,
                  logz=0.0, logzerr=0.0, upoints=None,
                  batchsize=128, vectorized=False, log_weight_threshold=-10,
                  **kwargs):
    """Importance-reweight a finished run onto a new likelihood.

    Processes points in decreasing weight order and stops early once the
    remaining points cannot contribute above *log_weight_threshold*.

    Returns a results dictionary in the standard schema (logz, ess,
    posterior summaries, weighted and equally weighted samples).
    """
    if not vectorized:
        loglike = vectorize(loglike)

    Npoints, ndim = points.shape
    if logw is None:
        logw = np.zeros(Npoints) - np.log(Npoints)
    logl_new = np.zeros(Npoints) - np.inf
    logw_new = np.zeros(Npoints) - np.inf
    assert logl.shape == (Npoints,)
    assert logw.shape == (Npoints,)

    indices = np.argsort(logl + logw)[::-1]
    ncall = 0
    for i in range(int(np.ceil(Npoints / batchsize))):
        batch = indices[i * batchsize:(i + 1) * batchsize]
        logl_new[batch] = loglike(points[batch, :])
        logw_new[batch] = logw[batch] + logl_new[batch]
        ncall += len(batch)
        if (logw_new[batch] < np.nanmax(logw_new) - np.log(Npoints)
                + log_weight_threshold).all():
            break

    logw_new0 = logw_new.max()
    w = np.exp(logw_new - logw_new0)
    logz_new = np.log(w.sum()) + logw_new0
    w /= w.sum()
    ess = len(w) / (1.0 + ((len(w) * w - 1) ** 2).sum() / len(w))

    integral_uncertainty_estimator = (
        ((w - 1 / Npoints) ** 2).sum() / (Npoints - 1)) ** 0.5
    logzerr_new = np.log(1 + integral_uncertainty_estimator)
    logzerr_new_total = (logzerr_new ** 2 + logzerr ** 2) ** 0.5

    samples = resample_equal(points, w)
    information_gain_bits = []
    for i in range(ndim):
        H, _ = np.histogram(points[:, i], weights=w, density=True,
                            bins=np.linspace(0, 1, 40))
        information_gain_bits.append(
            float((np.log2(1 / ((H + 0.001) * 40)) / 40).sum()))

    j = logl_new.argmax()
    return dict(
        ncall=ncall,
        niter=Npoints,
        logz=logz_new, logzerr=logzerr_new_total,
        ess=ess,
        posterior=dict(
            mean=samples.mean(axis=0).tolist(),
            stdev=samples.std(axis=0).tolist(),
            median=np.percentile(samples, 50, axis=0).tolist(),
            errlo=np.percentile(samples, 15.8655, axis=0).tolist(),
            errup=np.percentile(samples, 84.1345, axis=0).tolist(),
            information_gain_bits=information_gain_bits,
        ),
        weighted_samples=dict(
            upoints=upoints, points=points, weights=w, logw=logw,
            logl=logl_new),
        samples=samples,
        maximum_likelihood=dict(
            logl=logl_new[j],
            point=points[j, :].tolist(),
            point_untransformed=upoints[j, :].tolist()
            if upoints is not None else None,
        ),
        param_names=param_names,
    )
