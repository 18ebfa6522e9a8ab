# noqa: D400 D205
"""Drop-in replacement for pymultinest.solve.

Example::

    from ultranest_tpu.solvecompat import pymultinest_solve_compat as solve

    # is a drop-in replacement for

    from pymultinest.solve import solve
"""

import string

import numpy as np

from .integrator import ReactiveNestedSampler
from .stepsampler import SliceSampler, generate_mixture_random_direction

__all__ = ['pymultinest_solve_compat']


def pymultinest_solve_compat(
        LogLikelihood, Prior, n_dims, paramnames=None,
        outputfiles_basename=None, resume=False,
        n_live_points=400, evidence_tolerance=0.5,
        seed=-1, max_iter=0, wrapped_params=None, verbose=True,
        speed="safe", **kwargs):
    """Run a nested sampling analysis with a pymultinest-style interface.

    For full control (resume, plotting, sampler options) use
    :class:`ultranest_tpu.ReactiveNestedSampler` directly.

    Parameters
    ----------
    LogLikelihood, Prior: functions
        single-point model functions (pymultinest convention)
    n_dims: int
        dimensionality
    paramnames: list of str or None
        parameter names (defaults to a, b, c, ...)
    outputfiles_basename: str or None
        output directory
    resume: bool
        resume from existing output
    n_live_points: int
        number of live points
    evidence_tolerance: float
        dlogz target
    seed: int
        random seed (>=0 to set)
    max_iter: int
        iteration limit (0: unlimited)
    wrapped_params: list of bools or None
        circular parameter flags
    verbose: bool
        show progress
    speed: 'safe', 'auto' or int
        'safe': region sampling only; 'auto': short run then calibrated
        slice sampling; int: slice sampling with that many steps

    Returns
    -------
    dict with logZ, logZerr, samples, weighted_samples
    """
    if paramnames is None:
        paramnames = list(string.ascii_lowercase)[:n_dims]
    if seed >= 0:
        np.random.seed(seed)
    assert len(paramnames) == n_dims
    min_ess = kwargs.pop('min_ess', 0)
    frac_remain = kwargs.pop('frac_remain', 0.01)
    Lepsilon = kwargs.pop('Lepsilon', 0.001)
    outputkwargs = {}
    if not verbose:
        outputkwargs = dict(viz_callback=False, show_status=False)

    sampler = ReactiveNestedSampler(
        paramnames, LogLikelihood, transform=Prior,
        log_dir=outputfiles_basename,
        resume='resume' if resume else 'overwrite',
        wrapped_params=wrapped_params, draw_multiple=False, vectorized=False)

    if speed == "safe":
        pass
    elif speed == "auto":
        sampler.run(
            dlogz=evidence_tolerance,
            max_iters=max_iter if max_iter > 0 else None,
            min_num_live_points=n_live_points,
            min_ess=min_ess, frac_remain=frac_remain,
            Lepsilon=Lepsilon, max_ncalls=40000, **outputkwargs)
        sampler.stepsampler = SliceSampler(
            nsteps=1000,
            generate_direction=generate_mixture_random_direction,
            adaptive_nsteps='move-distance',
            region_filter=kwargs.get('region_filter', True))
    else:
        sampler.stepsampler = SliceSampler(
            generate_direction=generate_mixture_random_direction,
            nsteps=speed, adaptive_nsteps=False, region_filter=False)

    sampler.run(dlogz=evidence_tolerance,
                max_iters=max_iter if max_iter > 0 else None,
                min_num_live_points=n_live_points,
                min_ess=min_ess, frac_remain=frac_remain,
                Lepsilon=Lepsilon, **outputkwargs)

    if verbose:
        sampler.print_results()
    results = sampler.results
    if outputfiles_basename is not None:
        sampler.plot()

    return dict(logZ=results['logz'],
                logZerr=results['logzerr'],
                samples=results['samples'],
                weighted_samples=results['weighted_samples'])
