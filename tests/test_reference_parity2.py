"""More numerical parity tests against pure-python reference modules."""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = '/root/reference/ultranest'

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference checkout not available')


def load_ref(name, deps=('utils',)):
    """Load a reference module with a synthetic package context."""
    if 'refultranest' not in sys.modules:
        pkg = types.ModuleType('refultranest')
        pkg.__path__ = [REF]
        sys.modules['refultranest'] = pkg
    for dep in list(deps) + [name]:
        key = 'refultranest.' + dep
        if key in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(
            key, os.path.join(REF, dep + '.py'))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[key] = mod
        spec.loader.exec_module(mod)
    return sys.modules['refultranest.' + name]


def test_store_pop_semantics():
    ref_store = load_ref('store', deps=())
    from ultranest_tpu import store as my_store
    import tempfile
    rng = np.random.RandomState(0)
    rows = []
    Lmin = -np.inf
    for i in range(50):
        L = rng.uniform(-10, 0)
        rows.append([Lmin if rng.uniform() < 0.8 else rng.uniform(-20, -10),
                     L, 0.0, rng.uniform(), rng.uniform()])
        if rng.uniform() < 0.5:
            Lmin = L

    stores = []
    for mod in (ref_store, my_store):
        tmp = tempfile.mktemp(suffix='.tsv')
        s = mod.TextPointStore(tmp, 5)
        for row in rows:
            s.add(row, 1)
        s.close()
        s = mod.TextPointStore(tmp, 5)
        stores.append(s)

    # identical replay sequences under identical pop thresholds
    rng = np.random.RandomState(1)
    for _ in range(80):
        Lq = rng.uniform(-15, 0)
        i1, r1 = stores[0].pop(Lq)
        i2, r2 = stores[1].pop(Lq)
        assert (i1 is None) == (i2 is None), Lq
        if i1 is not None:
            assert i1 == i2
            np.testing.assert_array_equal(r1, r2)
    assert stores[0].stack_empty == stores[1].stack_empty


def test_hotstart_quantile_intervals():
    ref_hot = load_ref('hotstart')
    from ultranest_tpu import hotstart as my_hot
    rng = np.random.RandomState(2)
    upoints = rng.normal(0.5, 0.05, size=(500, 3)).clip(1e-3, 1 - 1e-3)
    uweights = rng.uniform(size=500)
    uweights /= uweights.sum()
    steps = 10.0 ** -(1.0 * np.arange(1, 8, 2))

    ulos_r, uhis_r = ref_hot.compute_quantile_intervals(
        steps, upoints, uweights)
    ulos_m, uhis_m = my_hot.compute_quantile_intervals(
        steps, upoints, uweights)
    np.testing.assert_array_equal(ulos_r, ulos_m)
    np.testing.assert_array_equal(uhis_r, uhis_m)

    out_r = ref_hot.compute_quantile_intervals_refined(
        steps, upoints, uweights)
    out_m = my_hot.compute_quantile_intervals_refined(
        steps, upoints, uweights)
    for a, b in zip(out_r, out_m):
        np.testing.assert_allclose(a, b, rtol=1e-13)


def test_hotstart_contbox_transform_parity():
    ref_hot = load_ref('hotstart')
    from ultranest_tpu import hotstart as my_hot
    rng = np.random.RandomState(3)
    upoints = rng.normal(0.5, 0.03, size=(400, 2)).clip(1e-3, 1 - 1e-3)
    uweights = np.ones(400) / 400

    def loglike(x):
        return -0.5 * ((x - 0.5) ** 2).sum(axis=-1)

    def transform(x):
        return x

    _, _, aux_tr_r, _ = ref_hot.get_auxiliary_contbox_parameterization(
        ['a', 'b'], loglike, transform, upoints, uweights, vectorized=True)
    _, _, aux_tr_m, _ = my_hot.get_auxiliary_contbox_parameterization(
        ['a', 'b'], loglike, transform, upoints, uweights, vectorized=True)

    u = rng.uniform(0.05, 0.95, size=(100, 3))
    np.testing.assert_allclose(aux_tr_r(u.copy()), aux_tr_m(u.copy()),
                               rtol=1e-12)


def test_stepsampler_direction_generators_parity():
    ref_ss = load_ref('stepsampler')
    from ultranest_tpu import stepsampler as my_ss
    from ultranest_tpu.mlfriends import AffineLayer, MLFriends

    rng = np.random.RandomState(4)
    u = rng.uniform(0.3, 0.7, size=(60, 3))
    tl = AffineLayer()
    tl.optimize(u, u)
    region = MLFriends(u, tl)
    ui = u[0]

    pairs = [
        ('generate_random_direction', {}),
        ('generate_cube_oriented_direction', {}),
        ('generate_cube_oriented_differential_direction', {}),
        ('generate_differential_direction', {}),
        ('generate_region_oriented_direction', {}),
        ('generate_region_random_direction', {}),
        ('generate_mixture_random_direction', {}),
    ]
    for name, kwargs in pairs:
        np.random.seed(7)
        v_ref = getattr(ref_ss, name)(ui, region, scale=1.3, **kwargs)
        np.random.seed(7)
        v_mine = getattr(my_ss, name)(ui, region, scale=1.3, **kwargs)
        np.testing.assert_allclose(v_ref, v_mine, rtol=1e-12, err_msg=name)


def test_samplingpath_geometry_parity():
    ref_sp = load_ref('samplingpath', deps=())
    from ultranest_tpu import samplingpath as my_sp
    rng = np.random.RandomState(5)
    for _ in range(30):
        x = rng.uniform(0.05, 0.95, size=3)
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        v *= rng.uniform(0.05, 0.3)
        t = rng.uniform(0, 12)
        x1, v1 = ref_sp.linear_steps_with_reflection(x.copy(), v.copy(), t)
        x2, v2 = my_sp.linear_steps_with_reflection(x.copy(), v.copy(), t)
        np.testing.assert_allclose(x1, x2, atol=1e-12)
        np.testing.assert_allclose(v1, v2, atol=1e-12)

    for _ in range(10):
        x = rng.uniform(0.05, 0.95, size=2)
        v = rng.normal(size=2) * 0.1
        (pN1, tN1, iN1), (pF1, tF1, iF1) = ref_sp.box_line_intersection(x, v)
        (pN2, tN2, iN2), (pF2, tF2, iF2) = my_sp.box_line_intersection(x, v)
        np.testing.assert_allclose(pN1, pN2, atol=1e-12)
        np.testing.assert_allclose(pF1, pF2, atol=1e-12)
        # travel times agree to round-off (the two implementations order
        # the divisions differently; bit-equality is not meaningful)
        assert np.isclose(tN1, tN2, rtol=1e-12, atol=0)
        assert np.isclose(tF1, tF2, rtol=1e-12, atol=0)
