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


def test_new_problem_families_run():
    """sine/corrpeak/hyperrect/dirichlet: numpy and jax paths agree."""
    import jax
    import numpy as np
    from ultranest_tpu import models

    rng = np.random.RandomState(0)
    for factory, kw in [(models.sine, {}), (models.corrpeak, dict(ndim=6)),
                        (models.hyperrect, dict(ndim=3)),
                        (models.dirichlet, dict(ndim=6)),
                        (models.slantedeggbox, dict(ndim=3))]:
        prob = factory(**kw)
        u = rng.uniform(0.05, 0.95, size=(16, prob.ndim))
        p = prob.transform(u) if prob.transform else u
        L = prob.loglike(p)
        assert L.shape == (16,) and np.isfinite(L).all(), prob.name
        if prob.jax_loglike is not None:
            pj = prob.jax_transform(u) if prob.jax_transform else u
            Lj = np.asarray(jax.jit(prob.jax_loglike)(np.asarray(pj)))
            np.testing.assert_allclose(Lj, L, rtol=2e-4, atol=2e-4)


def test_sine_problem_samples():
    """The wrapped-phase sine regression solves end-to-end."""
    import numpy as np
    from ultranest_tpu import ReactiveNestedSampler, models

    prob = models.sine(ndata=20, contrast=50)
    sampler = ReactiveNestedSampler(
        prob.param_names, prob.loglike, transform=prob.transform,
        vectorized=True, seed=3, wrapped_params=prob.wrapped_params)
    res = sampler.run(min_num_live_points=100, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.5,
                      max_ncalls=150000)
    assert np.isfinite(res['logz'])


def test_dirichlet_problem_samples():
    """Simplex-prior histogram deconvolution solves end-to-end."""
    import numpy as np
    from ultranest_tpu import ReactiveNestedSampler, models

    prob = models.dirichlet(ndim=5)
    sampler = ReactiveNestedSampler(seed=4,
                                    **prob.sampler_kwargs(use_jax=False))
    res = sampler.run(min_num_live_points=100, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.5,
                      max_ncalls=150000)
    assert np.isfinite(res['logz'])
