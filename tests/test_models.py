import numpy as np
import pytest

from ultranest_tpu import models


@pytest.mark.parametrize("factory,kwargs", [
    (models.gauss, dict(ndim=3)),
    (models.multigauss, dict(ndim=2)),
    (models.asymgauss, dict(ndim=10)),
    (models.corrgauss, dict(ndim=4)),
    (models.eggbox, dict()),
    (models.rosenbrock, dict(ndim=2)),
    (models.multishell, dict(ndim=2)),
    (models.shell, dict(ndim=2)),
    (models.loggamma, dict(ndim=6)),
    (models.funnel, dict(ndim=3)),
    (models.pyramid, dict(ndim=2)),
])
def test_problem_consistency(factory, kwargs):
    """numpy and jax implementations must agree."""
    prob = factory(**kwargs)
    rng = np.random.RandomState(0)
    u = rng.uniform(0.05, 0.95, size=(64, prob.ndim))
    if prob.transform is not None:
        theta = prob.transform(u)
    else:
        theta = u
    L_np = prob.loglike(theta)
    assert L_np.shape == (64,)
    assert np.isfinite(L_np).all()
    if prob.jax_loglike is not None:
        if prob.jax_transform is not None:
            theta_j = np.asarray(prob.jax_transform(u))
            np.testing.assert_allclose(theta_j, theta, rtol=1e-5)
        L_j = np.asarray(prob.jax_loglike(np.asarray(theta, np.float64)))
        np.testing.assert_allclose(L_j, L_np, rtol=2e-4, atol=1e-4)


def test_gauss_runs_to_correct_logz():
    from ultranest_tpu import ReactiveNestedSampler
    prob = models.gauss(ndim=2, sigma=0.1)
    sampler = ReactiveNestedSampler(seed=1, **prob.sampler_kwargs(use_jax=False))
    res = sampler.run(min_num_live_points=100, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0)
    assert abs(res['logz'] - prob.logz) < 3 * max(res['logzerr'], 0.2)


def test_multishell_runs_to_correct_logz():
    from ultranest_tpu import ReactiveNestedSampler
    prob = models.multishell(ndim=2, w=0.01)
    # recompute analytic logz for the custom width
    sampler = ReactiveNestedSampler(seed=2, **prob.sampler_kwargs(use_jax=False))
    res = sampler.run(min_num_live_points=200, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0)
    assert abs(res['logz'] - prob.logz) < 1.0, (res['logz'], prob.logz)
