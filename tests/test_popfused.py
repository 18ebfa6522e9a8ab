"""Device-resident population slice sampler tests."""
import numpy as np

from ultranest_tpu import ReactiveNestedSampler, models
from ultranest_tpu.mlfriends import ScalingLayer, SimpleRegion
from ultranest_tpu.popfused import FusedPopulationSliceSampler


def test_gauss_2d():
    prob = models.gauss(ndim=2, sigma=0.1)
    sampler = ReactiveNestedSampler(seed=1,
                                    **prob.sampler_kwargs(use_jax=False))
    sampler.stepsampler = FusedPopulationSliceSampler(
        popsize=64, nsteps=8, jax_loglike=prob.jax_loglike, seed=1)
    res = sampler.run(min_num_live_points=100, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.1)
    assert abs(res['logz'] - prob.logz) < 1.0, res['logz']
    info = sampler.stepsampler.get_info_dict()
    assert info['frac_far_enough'] > 0.5


def test_asymgauss_highdim():
    ndim = 16
    prob = models.asymgauss(ndim=ndim, sigma_min=0.02)
    sampler = ReactiveNestedSampler(seed=2,
                                    **prob.sampler_kwargs(use_jax=False))
    sampler.transform_layer_class = ScalingLayer
    sampler.stepsampler = FusedPopulationSliceSampler(
        popsize=128, nsteps=2 * ndim, jax_loglike=prob.jax_loglike, seed=2)
    res = sampler.run(min_num_live_points=200, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.1,
                      region_class=SimpleRegion, cluster_num_live_points=0)
    assert abs(res['logz'] - prob.logz) < 3 * max(res['logzerr'], 0.5), \
        (res['logz'], res['logzerr'])


def test_transform_is_applied():
    prob = models.eggbox()
    sampler = ReactiveNestedSampler(seed=3,
                                    **prob.sampler_kwargs(use_jax=False))
    sampler.stepsampler = FusedPopulationSliceSampler(
        popsize=64, nsteps=6, jax_loglike=prob.jax_loglike,
        jax_transform=prob.jax_transform, seed=3)
    res = sampler.run(min_num_live_points=200, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.5, max_ncalls=500000)
    assert abs(res['logz'] - prob.logz) < 3.0, (res['logz'], prob.logz)
