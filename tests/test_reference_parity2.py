"""More numerical parity tests against pure-python reference modules.

With a reference checkout present these run the oracle live; otherwise
they assert against the recorded oracle outputs in
``tests/data/reference_parity.npz`` (see tests/parity_fixtures.py).
"""
import importlib.util
import os
import sys
import tempfile
import types

import numpy as np

from parity_fixtures import REF, expected


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


def _store_rows():
    rng = np.random.RandomState(0)
    rows = []
    Lmin = -np.inf
    for _ in range(50):
        L = rng.uniform(-10, 0)
        rows.append([Lmin if rng.uniform() < 0.8 else rng.uniform(-20, -10),
                     L, 0.0, rng.uniform(), rng.uniform()])
        if rng.uniform() < 0.5:
            Lmin = L
    rng = np.random.RandomState(1)
    queries = rng.uniform(-15, 0, size=80)
    return rows, queries


def _run_store_pops(store_mod, rows, queries):
    """Write rows, reopen, replay pops; encode (idx, row) per query.

    ``None`` pops are encoded as idx -1 / NaN rows so the trajectory is
    one fixed-shape array pair.
    """
    tmp = tempfile.mktemp(suffix='.tsv')
    s = store_mod.TextPointStore(tmp, 5)
    for row in rows:
        s.add(row, 1)
    s.close()
    s = store_mod.TextPointStore(tmp, 5)
    idxs = np.full(len(queries), -1, dtype=np.int64)
    out_rows = np.full((len(queries), 5), np.nan)
    for j, Lq in enumerate(queries):
        i, r = s.pop(Lq)
        if i is not None:
            idxs[j] = i
            out_rows[j] = r
    stack_empty = np.array([s.stack_empty], dtype=bool)
    os.remove(tmp)
    return idxs, out_rows, stack_empty


def test_store_pop_semantics():
    from ultranest_tpu import store as my_store
    rows, queries = _store_rows()
    mine = _run_store_pops(my_store, rows, queries)

    def compute_ref():
        return _run_store_pops(load_ref('store', deps=()), rows, queries)

    ref = expected('store_pops', compute_ref, n_outputs=3)
    np.testing.assert_array_equal(ref[0], mine[0])
    np.testing.assert_array_equal(ref[1], mine[1])
    assert ref[2][0] == mine[2][0]


def _hotstart_inputs():
    rng = np.random.RandomState(2)
    upoints = rng.normal(0.5, 0.05, size=(500, 3)).clip(1e-3, 1 - 1e-3)
    uweights = rng.uniform(size=500)
    uweights /= uweights.sum()
    steps = 10.0 ** -(1.0 * np.arange(1, 8, 2))
    return steps, upoints, uweights


def test_hotstart_quantile_intervals():
    from ultranest_tpu import hotstart as my_hot
    steps, upoints, uweights = _hotstart_inputs()

    def compute_ref():
        ref_hot = load_ref('hotstart')
        ulos, uhis = ref_hot.compute_quantile_intervals(
            steps, upoints, uweights)
        refined = ref_hot.compute_quantile_intervals_refined(
            steps, upoints, uweights)
        return (ulos, uhis) + tuple(refined)

    ref = expected('hotstart_quantiles', compute_ref, n_outputs=5)

    ulos_m, uhis_m = my_hot.compute_quantile_intervals(
        steps, upoints, uweights)
    np.testing.assert_array_equal(ref[0], ulos_m)
    np.testing.assert_array_equal(ref[1], uhis_m)

    out_m = my_hot.compute_quantile_intervals_refined(
        steps, upoints, uweights)
    for a, b in zip(ref[2:], out_m):
        np.testing.assert_allclose(a, b, rtol=1e-13)


def test_hotstart_contbox_transform_parity():
    from ultranest_tpu import hotstart as my_hot
    rng = np.random.RandomState(3)
    upoints = rng.normal(0.5, 0.03, size=(400, 2)).clip(1e-3, 1 - 1e-3)
    uweights = np.ones(400) / 400

    def loglike(x):
        return -0.5 * ((x - 0.5) ** 2).sum(axis=-1)

    def transform(x):
        return x

    u = rng.uniform(0.05, 0.95, size=(100, 3))

    def compute_ref():
        ref_hot = load_ref('hotstart')
        _, _, aux_tr_r, _ = ref_hot.get_auxiliary_contbox_parameterization(
            ['a', 'b'], loglike, transform, upoints, uweights,
            vectorized=True)
        return np.asarray(aux_tr_r(u.copy()))

    ref_out = expected('hotstart_contbox', compute_ref)

    _, _, aux_tr_m, _ = my_hot.get_auxiliary_contbox_parameterization(
        ['a', 'b'], loglike, transform, upoints, uweights, vectorized=True)
    np.testing.assert_allclose(ref_out, aux_tr_m(u.copy()), rtol=1e-12)


DIRECTION_GENERATORS = [
    'generate_random_direction',
    'generate_cube_oriented_direction',
    'generate_cube_oriented_differential_direction',
    'generate_differential_direction',
    'generate_region_oriented_direction',
    'generate_region_random_direction',
    'generate_mixture_random_direction',
]


def test_stepsampler_direction_generators_parity():
    from ultranest_tpu import stepsampler as my_ss
    from ultranest_tpu.mlfriends import AffineLayer, MLFriends

    rng = np.random.RandomState(4)
    u = rng.uniform(0.3, 0.7, size=(60, 3))
    tl = AffineLayer()
    tl.optimize(u, u)
    region = MLFriends(u, tl)
    ui = u[0]

    def compute_ref():
        ref_ss = load_ref('stepsampler')
        outs = []
        for name in DIRECTION_GENERATORS:
            np.random.seed(7)
            outs.append(np.asarray(
                getattr(ref_ss, name)(ui, region, scale=1.3)))
        return tuple(outs)

    refs = expected('direction_generators', compute_ref,
                    n_outputs=len(DIRECTION_GENERATORS))
    for name, v_ref in zip(DIRECTION_GENERATORS, refs):
        np.random.seed(7)
        v_mine = getattr(my_ss, name)(ui, region, scale=1.3)
        np.testing.assert_allclose(v_ref, v_mine, rtol=1e-12, err_msg=name)


def _samplingpath_inputs():
    rng = np.random.RandomState(5)
    reflect = []
    for _ in range(30):
        x = rng.uniform(0.05, 0.95, size=3)
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        v *= rng.uniform(0.05, 0.3)
        t = rng.uniform(0, 12)
        reflect.append((x, v, t))
    box = []
    for _ in range(10):
        x = rng.uniform(0.05, 0.95, size=2)
        v = rng.normal(size=2) * 0.1
        box.append((x, v))
    return reflect, box


def _run_samplingpath(sp_mod, reflect, box):
    pairs = [sp_mod.linear_steps_with_reflection(x.copy(), v.copy(), t)
             for x, v, t in reflect]
    xs = np.array([p[0] for p in pairs])
    vs = np.array([p[1] for p in pairs])
    near = []
    far = []
    tnear = []
    tfar = []
    for x, v in box:
        (pN, tN, _), (pF, tF, _) = sp_mod.box_line_intersection(x, v)
        near.append(pN)
        far.append(pF)
        tnear.append(tN)
        tfar.append(tF)
    return (xs, vs, np.array(near), np.array(far), np.array(tnear),
            np.array(tfar))


def test_samplingpath_geometry_parity():
    from ultranest_tpu import samplingpath as my_sp
    reflect, box = _samplingpath_inputs()
    mine = _run_samplingpath(my_sp, reflect, box)

    def compute_ref():
        return _run_samplingpath(load_ref('samplingpath', deps=()),
                                 reflect, box)

    ref = expected('samplingpath_geometry', compute_ref, n_outputs=6)
    np.testing.assert_allclose(ref[0], mine[0], atol=1e-12)
    np.testing.assert_allclose(ref[1], mine[1], atol=1e-12)
    np.testing.assert_allclose(ref[2], mine[2], atol=1e-12)
    np.testing.assert_allclose(ref[3], mine[3], atol=1e-12)
    # travel times agree to round-off (the two implementations order
    # the divisions differently; bit-equality is not meaningful)
    np.testing.assert_allclose(ref[4], mine[4], rtol=1e-12, atol=0)
    np.testing.assert_allclose(ref[5], mine[5], rtol=1e-12, atol=0)
