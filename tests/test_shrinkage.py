"""Per-step volume shrinkage correctness of the step samplers.

The strongest statistical test of a constrained sampler: on problems with
known volume(L), each replacement must shrink the enclosed volume by a
Beta(1, nlive)-distributed factor. Biased samplers fail this uniformly.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'evaluate'))

import evaluate_sampling  # noqa: E402
from problems import get_problem  # noqa: E402


@pytest.mark.parametrize("samplername,problem,ndim", [
    ('regionslice', 'circgauss', 2),
    ('cubeslice', 'circgauss', 4),
    ('regionball', 'pyramid', 2),
    ('popslice', 'circgauss', 2),
])
def test_shrinkage_is_unbiased(samplername, problem, ndim):
    nlive = 100
    nsteps = 300
    sampler = evaluate_sampling.make_sampler(samplername, ndim, 2 * ndim + 4)
    loglike, grad, volume, warmup = get_problem(problem, ndim=ndim)
    Lsequence, ncalls, steps = evaluate_sampling.evaluate_warmed_sampler(
        problem, ndim, nlive, nsteps, sampler, seed=2)
    shrinkage, cdf = evaluate_sampling.shrinkage_diagnostic(
        Lsequence, volume, ndim, nlive)
    assert len(cdf) > 100
    # mean of a uniform CDF is 0.5; std of the mean = 1/sqrt(12 n)
    tol = 5 / (12 * len(cdf)) ** 0.5
    assert abs(cdf.mean() - 0.5) < tol, (
        samplername, problem, ndim, cdf.mean(), tol)


def test_shrinkage_fused_spec_engine():
    """Speculative-shrink device engine must pass the shrinkage oracle.

    The spec engine's accepted chain is by construction the sequential
    slice sampler's chain (candidates are drawn conditioned on the
    rejection of all earlier ones), so the Beta(1, nlive) shrinkage law
    must hold exactly.
    """
    from ultranest_tpu.popfused import FusedPopulationSliceSampler
    ndim = 2
    sampler = FusedPopulationSliceSampler(
        popsize=16, nsteps=2 * ndim + 4,
        jax_loglike=lambda X: -0.5 * ((X - 0.5) ** 2).sum(axis=1),
        engine='spec', seed=3)
    loglike, grad, volume, warmup = get_problem('circgauss', ndim=ndim)
    nlive = 100
    Lsequence, ncalls, steps = evaluate_sampling.evaluate_warmed_sampler(
        'circgauss', ndim, nlive, 300, sampler, seed=2)
    shrinkage, cdf = evaluate_sampling.shrinkage_diagnostic(
        Lsequence, volume, ndim, nlive)
    assert len(cdf) > 100
    tol = 5 / (12 * len(cdf)) ** 0.5
    assert abs(cdf.mean() - 0.5) < tol, (cdf.mean(), tol)
