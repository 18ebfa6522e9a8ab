"""Direct tests for surfaces only exercised indirectly elsewhere.

Covers the live-viz module (every run test passes viz_callback=False),
the remaining step-sampler factories and nsteps-adaptation hooks, the
point-store API driven directly (not via storage_backend strings), the
gaussian-approximation hot-start family, and small utils.
"""
import io
import os
import shutil
import sys
import tempfile

import numpy as np
import pytest

import matplotlib
matplotlib.use('Agg')

from ultranest_tpu import ReactiveNestedSampler
from ultranest_tpu import stepsampler as ss


def gauss_loglike(theta):
    return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum(axis=1)


def transform_unit(x):
    return x


GAUSS2D_ANALYTIC = np.log(2 * np.pi * 0.1 ** 2)


def run_sampler_on_gauss(sampler, seed=4, nlive=100, **kwargs):
    rsampler = ReactiveNestedSampler(
        ['a', 'b'], gauss_loglike, transform=transform_unit,
        vectorized=True, seed=seed)
    rsampler.stepsampler = sampler
    return rsampler.run(min_num_live_points=nlive, viz_callback=False,
                        show_status=False, max_num_improvement_loops=0,
                        min_ess=0, dlogz=2.0, frac_remain=0.1, **kwargs)


@pytest.mark.parametrize("make_sampler", [
    lambda: ss.BallSliceSampler(nsteps=10),
    lambda: ss.RegionSequentialSliceSampler(nsteps=10),
    lambda: ss.RegionMHSampler(nsteps=20, check_nsteps=False),
    lambda: ss.SpeedVariableRegionSliceSampler(
        step_matrix=[Ellipsis, [0], [1]]),
])
def test_remaining_factories_run(make_sampler):
    results = run_sampler_on_gauss(make_sampler())
    assert abs(results['logz'] - GAUSS2D_ANALYTIC) < 2.0, results['logz']


@pytest.mark.parametrize("adaptive", [
    'move-distance', 'proposal-total-distances',
    'proposal-summed-distances-NN'])
def test_adaptive_nsteps_options(adaptive):
    sampler = ss.RegionSliceSampler(nsteps=4, adaptive_nsteps=adaptive,
                                    check_nsteps=False)
    results = run_sampler_on_gauss(sampler)
    assert abs(results['logz'] - GAUSS2D_ANALYTIC) < 2.0
    info = sampler.get_info_dict()
    # the jump-distance criterion ran and adapted nsteps within bounds
    # (an easy 2-d target can legitimately adapt down to 1)
    assert info['num_logs'] > 0
    assert 1 <= sampler.nsteps <= sampler.max_nsteps


def test_viz_nicelogger_renders():
    from ultranest_tpu.mlfriends import AffineLayer, MLFriends
    from ultranest_tpu.viz import (get_default_viz_callback, nicelogger,
                                   round_parameterlimits)

    plo, phi, fmts = round_parameterlimits(np.array([0.02, -3.0]),
                                           np.array([0.97, 12.0]))
    assert (plo <= np.array([0.02, -3.0])).all()
    assert (phi >= np.array([0.97, 12.0])).all()
    assert len(fmts) == 2

    rng = np.random.RandomState(1)
    us = rng.uniform(0.4, 0.6, size=(80, 2))
    layer = AffineLayer()
    layer.optimize(us, us)
    region = MLFriends(us, layer)
    region.maxradiussq, region.enlarge = region.compute_enlargement(
        nbootstraps=5, rng=rng)
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        nicelogger(points=dict(u=us, p=us * 10, logl=-np.arange(80.0)),
                   info=dict(it=10, ncall=100, logz=-1.0, logz_remain=-5.0,
                             paramnames=['a', 'b'], logvol=-2.0),
                   region=region, transformLayer=layer, region_fresh=True)
    finally:
        sys.stdout = old
    out = buf.getvalue()
    assert 'logZ' in out and 'a' in out and '|' in out

    cb = get_default_viz_callback()
    assert cb is None or callable(cb)


def test_stepsampler_chain_logfile(tmp_path):
    # StepSampler(log=open(...)) writes per-chain raw rows
    # (reference stepsampler.py:937-954)
    path = tmp_path / 'chains.txt'
    with open(path, 'w') as f:
        sampler = ss.RegionSliceSampler(nsteps=6, log=f)
        run_sampler_on_gauss(sampler, nlive=50, max_iters=300)
    text = path.read_text()
    assert len(text.splitlines()) > 10


def test_viz_live_points_widget():
    pytest.importorskip('ipywidgets')
    from ultranest_tpu.viz import LivePointsWidget
    w = LivePointsWidget()
    rng = np.random.RandomState(2)
    us = rng.uniform(0.4, 0.6, size=(30, 2))
    w(points=dict(u=us, p=us, logl=-np.arange(30.0)),
      info=dict(logz=-1.0, logz_remain=-4.0, paramnames=['a', 'b']),
      region=None, transformLayer=None)
    assert w.grid is not None
    assert 'logZ' in w.label.value
    assert '...' in w.grid[0, 1].value


def test_pointstore_direct_api():
    from ultranest_tpu.store import (HDF5PointStore, NullPointStore,
                                     TextPointStore)

    null = NullPointStore(4)
    assert null.pop(0.5) == (None, None)
    null.add([0.0, 1.0, 1.0, 0.5], 1)
    assert null.pop(0.5) == (None, None)

    tmp = tempfile.mkdtemp()
    try:
        rows = [[-np.inf, -8.0, 1.0, 0.1],
                [-8.0, -2.0, 1.0, 0.2],
                [-8.0, -1.0, 1.0, 0.3]]
        for cls, fn in ((TextPointStore, 'pts.tsv'),
                        (HDF5PointStore, 'pts.hdf5')):
            path = os.path.join(tmp, fn)
            store = cls(path, 4)
            for row in rows:
                store.add(row, len(rows))
            store.close()
            # reopen: replay pops the first row with row_Lmin <= Lmin < L
            store = cls(path, 4)
            idx, row = store.pop(-np.inf)
            assert idx == 0 and row[1] == -8.0
            idx, row = store.pop(-8.0)
            assert idx == 1 and row[1] == -2.0
            idx, row = store.pop(-8.0)
            assert idx == 2 and row[1] == -1.0
            assert store.pop(-8.0) == (None, None)
            assert store.stack_empty
            store.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_hotstart_gaussian_family():
    from ultranest_tpu.hotstart import (
        get_auxiliary_problem, get_extended_auxiliary_independent_problem,
        get_extended_auxiliary_problem)

    def loglike(theta):
        return float(-0.5 * (((theta - 5.0) / 0.5) ** 2).sum())

    def transform(u):
        return u * 10.0

    ctr = np.array([0.5, 0.5])
    invcov = np.linalg.inv(np.diag([0.05, 0.05]) ** 2)

    aux_ll, aux_tr = get_auxiliary_problem(loglike, transform, ctr, invcov,
                                           enlargement_factor=3.0)
    u = np.full(2, 0.5)
    p = aux_tr(u)
    assert p.shape == (2,)
    assert np.isfinite(aux_ll(u))

    aux_ll, aux_tr = get_extended_auxiliary_problem(
        loglike, transform, ctr, invcov, enlargement_factor=3.0)
    out = aux_tr(u)
    assert out.shape == (3,)  # params + log correction weight
    assert np.isfinite(aux_ll(u))

    aux_ll, aux_tr = get_extended_auxiliary_independent_problem(
        loglike, transform, ctr, np.array([0.05, 0.05]), df=10)
    out = aux_tr(u)
    assert out.shape == (3,)
    assert np.isfinite(aux_ll(u))
    # the deformation must concentrate samples near the posterior center:
    # the mapped point at the cube center is the posterior center itself
    assert abs(out[0] - 5.0) < 1.0 and abs(out[1] - 5.0) < 1.0


def test_utils_small_helpers():
    from ultranest_tpu.utils import (effective_sample_size,
                                     information_gain_bits, listify,
                                     make_run_dir, summarize_posterior,
                                     verify_gradient)

    assert listify([1, 2], [3]) == [1, 2, 3]

    w = np.full(100, 0.01)
    assert abs(effective_sample_size(w) - 100) < 1e-6
    w2 = np.zeros(100)
    w2[0] = 1.0
    assert effective_sample_size(w2) <= 1.0 + 1e-6

    rng = np.random.RandomState(0)
    upoints = rng.uniform(0.45, 0.55, size=(500, 2))
    weights = np.full(500, 1.0 / 500)
    gain = information_gain_bits(upoints, weights)
    assert np.all(np.asarray(gain) > 0)  # concentrated -> information

    samples = rng.normal(3.0, 0.1, size=(2000, 2))
    summary = summarize_posterior(samples)
    assert np.allclose(summary['median'], 3.0, atol=0.05)

    # verify_gradient: correct gradient passes quietly (vectorized fns)
    def tr(u):
        return u

    def ll(p):
        return -0.5 * ((p / 0.1) ** 2).sum(axis=1)

    def grad(u):
        return -u / 0.1 ** 2

    verify_gradient(2, tr, ll, grad, combination=False)

    tmp = tempfile.mkdtemp()
    try:
        folder = make_run_dir(tmp, run_num=None)
        assert os.path.isdir(folder['run_dir'])
        folder2 = make_run_dir(tmp, run_num=None)
        assert folder2['run_dir'] != folder['run_dir']
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_netiter_print_tree():
    from ultranest_tpu.netiter import PointPile, TreeNode, print_tree

    pp = PointPile(1, 1)
    root = TreeNode(id=-1, value=-np.inf)
    a = pp.make_node(0.0, np.array([0.1]), np.array([0.1]))
    b = pp.make_node(1.0, np.array([0.2]), np.array([0.2]))
    c = pp.make_node(2.0, np.array([0.3]), np.array([0.3]))
    root.children += [a, b]
    a.children.append(c)
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        print_tree([root], title='demo')
    finally:
        sys.stdout = old
    assert 'demo' in buf.getvalue()
