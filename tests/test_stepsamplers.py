import numpy as np
import pytest

from ultranest_tpu import ReactiveNestedSampler
from ultranest_tpu.mlfriends import AffineLayer, MLFriends
from ultranest_tpu import popstepsampler as pss
from ultranest_tpu import stepsampler as ss
from ultranest_tpu.ops import stepfuncs as sf


def make_region(npts=100, ndim=2, seed=0):
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


def gauss_loglike(theta):
    return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum(axis=1)


def transform_unit(x):
    return np.asarray(x)


def test_direction_generators_scalar():
    region = make_region()
    ui = region.u[0]
    np.random.seed(1)
    for gen in [ss.generate_random_direction,
                ss.generate_cube_oriented_direction,
                ss.generate_cube_oriented_differential_direction,
                ss.generate_differential_direction,
                ss.generate_partial_differential_direction,
                ss.generate_region_oriented_direction,
                ss.generate_region_random_direction,
                ss.generate_mixture_random_direction,
                ss.SequentialDirectionGenerator(),
                ss.SequentialRegionDirectionGenerator(),
                ss.OrthogonalDirectionGenerator(ss.generate_random_direction)]:
        v = gen(ui, region, scale=1.0)
        assert v.shape == ui.shape
        assert np.isfinite(v).all()
        assert (v != 0).any()


def test_direction_generators_vectorized():
    region = make_region()
    np.random.seed(2)
    ui = region.u[:17]
    for gen in [sf.generate_cube_oriented_direction,
                sf.generate_cube_oriented_direction_scaled,
                sf.generate_random_direction,
                sf.generate_region_oriented_direction,
                sf.generate_region_random_direction,
                sf.generate_differential_direction,
                sf.generate_mixture_random_direction]:
        v = gen(ui, region, scale=1.0)
        assert v.shape == ui.shape
        assert np.isfinite(v).all()
        assert (v != 0).any(axis=1).all(), gen


def test_unitcube_line_intersection():
    origin = np.array([[0.5, 0.5]])
    direction = np.array([[1.0, 0.0]])
    tleft, tright = pss.unitcube_line_intersection(origin, direction)
    assert np.isclose(tleft[0], -0.5)
    assert np.isclose(tright[0], 0.5)

    direction = np.array([[1.0, 1.0]])
    tleft, tright = pss.unitcube_line_intersection(origin, direction)
    assert np.isclose(tleft[0], -0.5)
    assert np.isclose(tright[0], 0.5)


def test_within_unit_cube():
    u = np.array([[0.5, 0.5], [1.1, 0.5], [0.5, -0.1], [0.0, 0.5]])
    np.testing.assert_array_equal(
        sf.within_unit_cube(u), [True, False, False, False])


def test_step_back():
    allL = np.array([
        [1.0, 2.0, 3.0, np.nan],
        [1.0, 0.5, 3.0, np.nan],
        [0.2, 2.0, 3.0, 4.0],
    ])
    generation = np.array([2, 2, 3])
    currentt = np.zeros(3)
    sf.step_back(0.8, allL, generation, currentt)
    # walker 0 untouched, walker 1 reverted to gen 0, walker 2 to gen -1
    assert generation[0] == 2
    assert generation[1] == 0
    assert generation[2] == -1
    assert np.isnan(currentt[1]) and np.isnan(currentt[2])
    assert np.isnan(allL[1, 1:]).all()
    assert np.isfinite(allL[0, :3]).all()


def run_sampler_on_gauss(sampler, seed=4, nlive=100, **kwargs):
    np.random.seed(seed)
    rsampler = ReactiveNestedSampler(
        ['a', 'b'], gauss_loglike, transform=transform_unit,
        vectorized=True, seed=seed)
    rsampler.stepsampler = sampler
    results = rsampler.run(min_num_live_points=nlive, viz_callback=False,
                           show_status=False, max_num_improvement_loops=0,
                           min_ess=0, dlogz=2.0, frac_remain=0.1, **kwargs)
    return results


GAUSS2D_ANALYTIC = np.log(2 * np.pi * 0.1**2)


@pytest.mark.parametrize("make_sampler", [
    lambda: ss.RegionSliceSampler(nsteps=10),
    lambda: ss.CubeSliceSampler(nsteps=10),
    lambda: ss.RegionBallSliceSampler(nsteps=10),
    lambda: ss.CubeMHSampler(nsteps=20, check_nsteps=False),
])
def test_scalar_stepsampler_run(make_sampler):
    results = run_sampler_on_gauss(make_sampler())
    assert abs(results['logz'] - GAUSS2D_ANALYTIC) < 2.0, results['logz']


@pytest.mark.parametrize("make_sampler", [
    lambda: pss.PopulationSliceSampler(
        popsize=16, nsteps=10,
        generate_direction=sf.generate_region_oriented_direction),
    lambda: pss.PopulationRandomWalkSampler(
        popsize=32, nsteps=20,
        generate_direction=sf.generate_region_random_direction, scale=0.2),
    lambda: pss.PopulationSimpleSliceSampler(
        popsize=16, nsteps=10,
        generate_direction=sf.generate_mixture_random_direction),
])
def test_population_stepsampler_run(make_sampler):
    results = run_sampler_on_gauss(make_sampler())
    assert abs(results['logz'] - GAUSS2D_ANALYTIC) < 2.0, results['logz']


def test_stepsampler_diagnostics():
    sampler = ss.RegionSliceSampler(nsteps=5)
    results = run_sampler_on_gauss(sampler)
    assert results is not None
    info = sampler.get_info_dict()
    assert info['num_logs'] > 0
    sampler.print_diagnostic()


def test_ellipsoid_bracket():
    center = np.array([0.5, 0.5])
    inv_axes = np.eye(2)
    ui = np.array([0.5, 0.5])
    v = np.array([1.0, 0.0])
    left, right = ss.ellipsoid_bracket(ui, v, center, inv_axes, 1.0)
    assert np.isclose(left, -1.0)
    assert np.isclose(right, 1.0)


def test_crop_bracket_at_unit_cube():
    ui = np.array([0.9, 0.5])
    v = np.array([1.0, 0.0])
    left, right, cl, cr = ss.crop_bracket_at_unit_cube(ui, v, -2.0, 2.0)
    assert cr
    assert right <= 0.1 + 1e-6
    assert cl
    assert left >= -0.9 - 1e-6


def test_island_selector():
    np.random.seed(5)
    sel = ss.IslandPopulationRandomLivepointSelector(island_size=4)
    Ls = np.arange(16).astype(float)
    us = np.zeros((16, 2))
    # dead point is index 5 -> island 1 (indices 4..7)
    for _ in range(20):
        i = sel(us, Ls, Lmin=5.0)
        assert 4 <= i < 8
