import numpy as np
import pytest

from ultranest_tpu.samplingpath import (SamplingPath, ContourSamplingPath,
                                        box_line_intersection,
                                        linear_steps_with_reflection,
                                        nearest_box_intersection_line,
                                        extrapolate_ahead, reflect,
                                        get_sphere_tangent, angle)


def test_box_intersection():
    origin = np.array([0.5, 0.5])
    direction = np.array([1.0, 0.0])
    (pN, tN, iN), (pF, tF, iF) = box_line_intersection(origin, direction)
    assert np.isclose(tF, 0.5)
    assert np.isclose(tN, -0.5)
    np.testing.assert_allclose(pF, [1.0, 0.5])
    np.testing.assert_allclose(pN, [0.0, 0.5])
    assert iF[0] == 0


def test_reflection_distance_preserved():
    """Total travel distance equals t * |v| regardless of reflections."""
    rng = np.random.RandomState(0)
    for _ in range(20):
        x = rng.uniform(0.1, 0.9, size=2)
        v = rng.normal(size=2)
        v /= np.linalg.norm(v)
        v *= 0.1
        x1, v1 = linear_steps_with_reflection(x, v, 7.3)
        assert (x1 >= 0).all() and (x1 <= 1).all()
        assert np.isclose(np.linalg.norm(v1), np.linalg.norm(v))


def test_reflection_reversibility():
    """Going t forward then t backward returns to the start."""
    rng = np.random.RandomState(1)
    for _ in range(20):
        x = rng.uniform(0.1, 0.9, size=3)
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        v *= 0.2
        t = rng.uniform(0, 10)
        x1, v1 = linear_steps_with_reflection(x, v, t)
        x2, v2 = linear_steps_with_reflection(x1, -v1, t)
        np.testing.assert_allclose(x2, x, atol=1e-9)
        np.testing.assert_allclose(-v2, v, atol=1e-9)


def test_reflect_off_normal():
    v = np.array([1.0, -1.0]) / np.sqrt(2)
    normal = np.array([0.0, 1.0])
    vnew = reflect(v, normal)
    np.testing.assert_allclose(vnew, [1.0 / np.sqrt(2), 1.0 / np.sqrt(2)])


def test_sphere_tangent():
    t = get_sphere_tangent(np.array([0.0, 0.0]), np.array([1.0, 0.0]))
    np.testing.assert_allclose(t, [-1.0, 0.0])


def test_sampling_path_interpolation():
    x0 = np.array([0.5, 0.5])
    v0 = np.array([0.01, 0.0])
    path = SamplingPath(x0, v0, 1.0)
    path.add(2, x0 + 2 * v0, v0, 2.0)
    # interpolate intermediate point
    x1, v1, L1, onpath = path.interpolate(1)
    np.testing.assert_allclose(x1, x0 + v0, atol=1e-12)
    assert onpath
    # extrapolate beyond ends
    x3, v3 = path.extrapolate(3)
    np.testing.assert_allclose(x3, x0 + 3 * v0, atol=1e-12)
    x_1, v_1 = path.extrapolate(-2)
    np.testing.assert_allclose(x_1, x0 - 2 * v0, atol=1e-12)


def _make_region(npts=100, ndim=2, seed=0):
    from ultranest_tpu.mlfriends import AffineLayer, MLFriends
    rng = np.random.RandomState(seed)
    u = rng.uniform(0.3, 0.7, size=(npts, ndim))
    tl = AffineLayer()
    tl.optimize(u, u)
    region = MLFriends(u, tl)
    maxd, enlarge = region.compute_enlargement(
        nbootstraps=10, rng=np.random.RandomState(seed))
    region.maxradiussq = maxd
    region.enlarge = enlarge
    region.create_ellipsoid()
    return region


def test_contour_gradient_points_inward():
    region = _make_region()
    path = ContourSamplingPath(
        SamplingPath(np.array([0.5, 0.5]), np.array([0.01, 0.0]), 1.0),
        region)
    # a point outside the cloud: normal should point back towards 0.5
    normal = path.gradient(np.array([0.9, 0.9]))
    assert np.isclose(np.linalg.norm(normal), 1)
    assert normal[0] < 0 and normal[1] < 0


def test_flatnuts_clocked_sampler():
    np.random.seed(2)
    region = _make_region(npts=200)
    from ultranest_tpu.flatnuts import ClockedStepSampler, DirectJumper
    from ultranest_tpu.samplingpath import SamplingPath, ContourSamplingPath

    def loglike(p):
        return -0.5 * (((p - 0.5) / 0.1) ** 2).sum(axis=1)

    def transform(u):
        return u.reshape((1, -1)) if u.ndim == 1 else u

    Lmin = -2.0
    ui = np.array([0.55, 0.48])
    Li = loglike(ui.reshape((1, -1)))[0]
    v = np.array([0.04, 0.01])
    cp = ContourSamplingPath(SamplingPath(ui, v, Li), region)
    sampler = ClockedStepSampler(cp)
    stepper = DirectJumper(sampler, nsteps=5)
    stepper.prepare_jump()
    Llast = None
    for _ in range(200):
        if sampler.is_done():
            break
        u, is_independent = sampler.next(Llast)
        Llast = None
        if u is not None and not is_independent:
            L = loglike(transform(u))[0]
            if L > Lmin:
                Llast = L
    unew, Lnew = stepper.make_jump()
    assert np.isfinite(unew).all()
    assert (unew > 0).all() and (unew < 1).all()
    assert Lnew > Lmin


def test_dychmc_gradient_from_jax():
    import jax.numpy as jnp
    from ultranest_tpu.dychmc import gradient_from_jax

    def jax_loglike(theta):
        return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum(axis=1)

    grad = gradient_from_jax(jax_loglike)
    g = grad(np.array([0.6, 0.5]))
    # normalized, pointing towards the mode (negative x direction)
    assert np.isclose(np.linalg.norm(g), 1, atol=1e-5)
    assert g[0] < -0.9


def test_dychmc_sampler_runs():
    np.random.seed(3)
    from ultranest_tpu.dychmc import DynamicCHMCSampler, gradient_from_jax
    import jax.numpy as jnp
    region = _make_region(npts=200, seed=4)

    def loglike(p):
        return -0.5 * (((p - 0.5) / 0.1) ** 2).sum(axis=1)

    def jax_loglike(p):
        return -0.5 * (((p - 0.5) / 0.1) ** 2).sum(axis=1)

    def transform(u):
        return u

    sampler = DynamicCHMCSampler(scale=0.05, nsteps=4)
    sampler.set_gradient(gradient_from_jax(jax_loglike))
    us = region.u
    Ls = loglike(us)
    Lmin = np.percentile(Ls, 20)
    ok = Ls > Lmin
    u, p, L, nc = sampler.__next__(region, Lmin, us[ok], Ls[ok],
                                   transform, loglike)
    assert L > Lmin
    assert nc > 0
    assert (u > 0).all() and (u < 1).all()


def test_dyhmc_sampler_runs():
    np.random.seed(5)
    from ultranest_tpu.dyhmc import (DynamicHMCSampler,
                                     transform_loglike_gradient_from_jax)
    region = _make_region(npts=200, seed=6)

    def loglike(p):
        return -0.5 * (((p - 0.5) / 0.1) ** 2).sum(axis=1)

    def jax_loglike(p):
        return -0.5 * (((p - 0.5) / 0.1) ** 2).sum(axis=1)

    def transform(u):
        return u

    tlg = transform_loglike_gradient_from_jax(jax_loglike)
    p, L, g = tlg(np.array([0.6, 0.5]))
    assert np.isclose(L, loglike(np.array([[0.6, 0.5]]))[0], atol=1e-4)

    sampler = DynamicHMCSampler(ndim=2, nsteps=3,
                                transform_loglike_gradient=tlg)
    us = region.u
    Ls = loglike(us)
    Lmin = np.percentile(Ls, 20)
    u, p, L, nc = sampler.__next__(region, Lmin, us, Ls, transform, loglike)
    assert (u > 0).all() and (u < 1).all()
    assert nc > 0


def test_pathsampler_run():
    from ultranest_tpu import ReactiveNestedSampler
    from ultranest_tpu.pathsampler import SamplingPathStepSampler

    def loglike(theta):
        return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum(axis=1)

    np.random.seed(7)
    sampler = ReactiveNestedSampler(['a', 'b'], loglike,
                                    transform=lambda x: x,
                                    vectorized=True, seed=7)
    sampler.stepsampler = SamplingPathStepSampler(nresets=3, nsteps=5)
    res = sampler.run(min_num_live_points=50, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.5, max_ncalls=20000)
    expected = np.log(2 * np.pi * 0.1**2)
    assert abs(res['logz'] - expected) < 2.5, res['logz']
