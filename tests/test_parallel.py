"""Mesh-sharded execution tests (8 virtual CPU devices)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ultranest_tpu.parallel import (make_mesh,
                                    parallel_propose_evaluate)


def jax_loglike(theta):
    return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum(axis=1)


def np_loglike(theta):
    return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum(axis=1)


def test_make_mesh():
    mesh = make_mesh(4)
    assert mesh.devices.size == 4
    assert mesh.axis_names == ('ranks',)


def test_parallel_propose_evaluate():
    mesh = make_mesh(8)
    f = parallel_propose_evaluate(mesh, jax_loglike, lambda u: u, 2,
                                  ndraw_per_shard=64)
    ctr = np.full(2, 0.5, np.float32)
    axes_T = np.eye(2, dtype=np.float32) * 0.3
    invcov = np.eye(2, dtype=np.float32) / 0.09
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    u, v, logl, acc, ncall = f(keys, ctr, axes_T, invcov,
                               np.float32(1.0), np.float32(-10.0))
    u = np.asarray(u)
    assert u.shape == (8 * 64, 2)
    assert int(ncall) > 0
    acc = np.asarray(acc)
    assert acc.any()
    # accepted points satisfy the threshold (verified on host)
    np.testing.assert_array_less(-10.0, np_loglike(u[acc]))
    # different shards produced different draws (fold_in RNG)
    assert not np.allclose(u[:64], u[64:128])


def test_sharded_fused_sampler_run():
    """Full nested sampling run with mesh-sharded candidate generation."""
    from ultranest_tpu import ReactiveNestedSampler
    mesh = make_mesh(8)
    sampler = ReactiveNestedSampler(
        ['a', 'b'], np_loglike, transform=lambda x: np.asarray(x),
        vectorized=True, seed=12, jax_loglike=jax_loglike,
        ndraw_min=1024, ndraw_max=4096, mesh=mesh)
    assert sampler.fused_sampler.nshards == 8
    res = sampler.run(min_num_live_points=100, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.1)
    expected = np.log(2 * np.pi * 0.1**2)
    assert abs(res['logz'] - expected) < 1.0, (res['logz'], expected)


def test_sharded_population_sampler_run():
    """Mesh-sharded population slice sampler: walkers split over shards."""
    from ultranest_tpu import ReactiveNestedSampler, models
    from ultranest_tpu.mlfriends import ScalingLayer, SimpleRegion
    from ultranest_tpu.popfused import FusedPopulationSliceSampler
    mesh = make_mesh(8)
    prob = models.asymgauss(ndim=8, sigma_min=0.02)
    sampler = ReactiveNestedSampler(seed=5,
                                    **prob.sampler_kwargs(use_jax=False))
    sampler.transform_layer_class = ScalingLayer
    sampler.stepsampler = FusedPopulationSliceSampler(
        popsize=128, nsteps=16, jax_loglike=prob.jax_loglike, seed=5,
        mesh=mesh)
    assert sampler.stepsampler.nshards == 8
    res = sampler.run(min_num_live_points=200, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.1,
                      region_class=SimpleRegion, cluster_num_live_points=0)
    assert abs(res['logz'] - prob.logz) < 3 * max(res['logzerr'], 0.5), \
        (res['logz'], res['logzerr'])


def test_sharded_bootstrap_radius_matches_single_device():
    """Mesh-split bootstrap rounds pmax-merge to the single-device radius."""
    import time
    from ultranest_tpu.ops.bootstrap import (_bootstrap_radius,
                                             make_bootstrap_masks)
    rng = np.random.RandomState(7)
    tpoints = rng.normal(size=(300, 6))
    masks = make_bootstrap_masks(len(tpoints), 30, rng=rng)
    mesh = make_mesh(8)

    r_single = _bootstrap_radius(tpoints, masks)
    r_sharded = _bootstrap_radius(tpoints, masks, mesh=mesh)
    assert r_single > 0
    np.testing.assert_allclose(r_sharded, r_single, rtol=1e-6)

    # also via the region API (strategy reduction path of _update_region)
    from ultranest_tpu.mlfriends import MLFriends, ScalingLayer
    layer = ScalingLayer()
    u = rng.uniform(0.3, 0.7, size=(200, 4))
    layer.optimize(u, u)
    region1 = MLFriends(u, layer)
    region2 = MLFriends(u, layer)
    rng1, rng2 = np.random.RandomState(3), np.random.RandomState(3)
    r1, f1 = region1.compute_enlargement(nbootstraps=24, rng=rng1)
    r2, f2 = region2.compute_enlargement(nbootstraps=24, rng=rng2,
                                         mesh=mesh)
    np.testing.assert_allclose(r2, r1, rtol=1e-6)
    np.testing.assert_allclose(f2, f1, rtol=1e-12)


def test_strategy_kl_table_mesh_matches_host():
    """Device-sharded KL table equals the host computation."""
    from ultranest_tpu.parallel.strategy import bootstrap_kl_table
    rng = np.random.RandomState(11)
    niter, nboot = 500, 30
    ref = np.log(rng.dirichlet(np.ones(niter))).reshape((-1, 1))
    other = np.log(rng.dirichlet(np.ones(niter), size=nboot)).T
    other[rng.uniform(size=other.shape) < 0.05] = -np.inf

    KL_host, KLtot_host = bootstrap_kl_table(ref, other, mesh=None)
    mesh = make_mesh(8)
    KL_dev, KLtot_dev = bootstrap_kl_table(ref, other, mesh=mesh)
    np.testing.assert_allclose(KL_dev, KL_host, atol=1e-6)
    np.testing.assert_allclose(KLtot_dev, KLtot_host, atol=1e-4)


def test_mesh_shard_count_relationship():
    """1- vs 8-device mesh, same seed: the documented relationship.

    The sharded proposal path folds the shard index into the RNG key,
    so different shard counts follow different random streams — the
    design claims *statistical compatibility*, NOT lockstep (unlike the
    reference's rank-lockstep MPI design). What IS exact:

    * determinism per shard count (same seed + same mesh = identical
      results, bitwise);
    * psum ncall bookkeeping: the run's ncall equals the root-point
      evaluations plus the sum of every dispatch's billed member count
      (cf. the reference's MPI-aware exact-bookkeeping oracle,
      /root/reference/tests/test_run.py:283-303).
    """
    from ultranest_tpu import ReactiveNestedSampler

    def run_once(mesh, nlive=100):
        sampler = ReactiveNestedSampler(
            ['a', 'b'], np_loglike, transform=lambda x: np.asarray(x),
            vectorized=True, seed=12, jax_loglike=jax_loglike,
            ndraw_min=1024, ndraw_max=4096, mesh=mesh)
        billed = []
        orig = sampler.fused_sampler._unpack

        def spy(out, num_params, ndraw):
            r = orig(out, num_params, ndraw)
            billed.append(int(r[3]))
            return r

        sampler.fused_sampler._unpack = spy
        res = sampler.run(min_num_live_points=nlive, viz_callback=False,
                          show_status=False, max_num_improvement_loops=0,
                          min_ess=0, dlogz=2.0, frac_remain=0.1)
        return res, sum(billed), nlive

    res1, billed1, nlive = run_once(None)
    res8, billed8, _ = run_once(make_mesh(8))
    res8b, billed8b, _ = run_once(make_mesh(8))

    # exact ncall bookkeeping, single- and multi-shard
    assert res1['ncall'] == billed1 + nlive, (res1['ncall'], billed1)
    assert res8['ncall'] == billed8 + nlive, (res8['ncall'], billed8)

    # determinism per shard count
    assert res8b['ncall'] == res8['ncall']
    assert res8b['logz'] == res8['logz']

    # statistical compatibility across shard counts
    sigma = np.hypot(res1['logzerr'], res8['logzerr'])
    assert abs(res1['logz'] - res8['logz']) < 3 * sigma, \
        (res1['logz'], res8['logz'], sigma)
    expected = np.log(2 * np.pi * 0.1**2)
    for r in (res1, res8):
        assert abs(r['logz'] - expected) < 3 * max(r['logzerr'], 0.5)
