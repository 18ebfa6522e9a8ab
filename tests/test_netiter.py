import numpy as np

from ultranest_tpu.netiter import (BreadthFirstIterator, MultiCounter,
                                   PointPile, SingleCounter, TreeNode,
                                   combine_results, count_tree,
                                   count_tree_between, find_nodes_before,
                                   logz_sequence)


def make_simple_run(nlive=50, niter=300, rng=None):
    """Classic fixed-N run as a tree: each consumed node gets one child."""
    if rng is None:
        rng = np.random.RandomState(1)
    pp = PointPile(1, 1)
    # exponential shells: L(i) rising
    logls = np.sort(rng.uniform(-100, 0, size=nlive))
    roots = [pp.make_node(logl, [rng.uniform()], [rng.uniform()])
             for logl in logls]
    root = TreeNode(id=-1, value=-np.inf, children=roots)
    explorer = BreadthFirstIterator(roots)
    for _ in range(niter):
        next_node = explorer.next_node()
        if next_node is None:
            break
        rootid, node, (_, _, active_values, _) = next_node
        # replacement likelihood above the current minimum
        newL = node.value + rng.uniform(0, 5)
        node.children.append(pp.make_node(newL, [rng.uniform()], [rng.uniform()]))
        explorer.expand_children_of(rootid, node)
    return root, pp


def textbook_integral(root, nlive):
    """Direct textbook nested sampling summation for a fixed-N chain tree."""
    # collect dead points in order
    explorer = BreadthFirstIterator(root.children)
    logls = []
    while True:
        nn = explorer.next_node()
        if nn is None:
            break
        rootid, node, _ = nn
        logls.append(node.value)
        explorer.expand_children_of(rootid, node)
    logls = np.array(logls)
    n = len(logls)
    # iterations with children shrink by exp(-1/N); the final N are leaves
    logvols = []
    logvolremaining = 0.0
    nl = nlive
    for i in range(n):
        is_leaf = i >= n - nlive
        if not is_leaf:
            logvols.append(np.log1p(-np.exp(-1.0 / nl)) + logvolremaining)
            logvolremaining += -1.0 / nl
        else:
            logvols.append(logvolremaining - np.log(nl))
            with np.errstate(divide='ignore'):
                logvolremaining += np.log1p(-1.0 / nl)
            nl -= 1
    logwt = np.array(logvols) + logls
    return np.logaddexp.reduce(logwt)


def test_breadth_first_order():
    pp = PointPile(1, 1)
    roots = [pp.make_node(v, [0.5], [0.5]) for v in [3.0, 1.0, 2.0]]
    explorer = BreadthFirstIterator(roots)
    seen = []
    while True:
        nn = explorer.next_node()
        if nn is None:
            break
        rootid, node, (nodes, rootids, values, ids) = nn
        seen.append(node.value)
        explorer.expand_children_of(rootid, node)
    assert seen == [1.0, 2.0, 3.0]


def test_count_tree():
    root, pp = make_simple_run(nlive=10, niter=20)
    nnodes, maxwidth = count_tree(root.children)
    assert maxwidth == 10
    assert nnodes == 10 + 20
    nnodes2, maxwidth2 = count_tree_between(root.children, -np.inf, np.inf)
    assert (nnodes, maxwidth) == (nnodes2, maxwidth2)


def test_single_counter_matches_textbook():
    nlive, niter = 50, 400
    root, pp = make_simple_run(nlive=nlive, niter=niter)
    counter = SingleCounter()
    explorer = BreadthFirstIterator(root.children)
    while True:
        nn = explorer.next_node()
        if nn is None:
            break
        rootid, node, (active_nodes, _, _, _) = nn
        counter.passing_node(node, active_nodes)
        explorer.expand_children_of(rootid, node)
    expected = textbook_integral(root, nlive)
    assert np.isclose(counter.logZ, expected, atol=1e-6), (counter.logZ, expected)


def test_multi_counter_main_matches_single():
    nlive, niter = 40, 300
    root, pp = make_simple_run(nlive=nlive, niter=niter)
    single = SingleCounter()
    multi = MultiCounter(nroots=nlive, nbootstraps=8,
                         rng=np.random.RandomState(5))
    explorer = BreadthFirstIterator(root.children)
    while True:
        nn = explorer.next_node()
        if nn is None:
            break
        rootid, node, (active_nodes, active_rootids, active_values, _) = nn
        single.passing_node(node, active_nodes)
        multi.passing_node(rootid, node, active_rootids, active_values)
        explorer.expand_children_of(rootid, node)
    assert np.isclose(single.logZ, multi.logZ, atol=1e-9)
    assert np.isclose(single.logZ, multi.all_logZ[0], atol=1e-9)
    # bootstrap estimators scatter around the main estimate
    assert np.isfinite(multi.logZ_bs)
    assert 0 < multi.logZerr_bs < 5


def test_multi_counter_incremental_nlive():
    """Incremental live counts must equal direct rootid-mask counting."""
    rng = np.random.RandomState(7)
    nlive = 20
    root, pp = make_simple_run(nlive=nlive, niter=100, rng=rng)
    multi = MultiCounter(nroots=nlive, nbootstraps=5,
                         rng=np.random.RandomState(3))
    explorer = BreadthFirstIterator(root.children)
    while True:
        nn = explorer.next_node()
        if nn is None:
            break
        rootid, node, (_, active_rootids, active_values, _) = nn
        direct = multi.rootids[:, active_rootids].sum(axis=1)
        if multi._nlive is not None:
            np.testing.assert_array_equal(multi._nlive, direct)
        multi.passing_node(rootid, node, active_rootids, active_values)
        explorer.expand_children_of(rootid, node)


def test_logz_sequence_and_combine():
    nlive = 40
    root, pp = make_simple_run(nlive=nlive, niter=400)
    sequence, results = logz_sequence(root, pp, nbootstraps=10, random=False)
    expected = textbook_integral(root, nlive)
    assert np.isclose(results['logz'], expected, atol=0.01)
    assert len(sequence['logz']) == results['niter']
    assert results['niter'] == 400 + nlive
    assert 0 < results['ess'] <= results['niter']
    assert np.isfinite(results['H'])
    w = results['weighted_samples']['weights']
    assert np.isclose(w.sum(), 1)
    assert results['samples'].shape[1] == 1
    assert 'insertion_order_MWW_test' in results


def test_find_nodes_before():
    pp = PointPile(1, 1)
    roots = [pp.make_node(float(v), [0.5], [0.5]) for v in [1, 2, 3]]
    # chain on first root: 1 -> 4 -> 5
    n4 = pp.make_node(4.0, [0.5], [0.5])
    n5 = pp.make_node(5.0, [0.5], [0.5])
    roots[0].children.append(n4)
    n4.children.append(n5)
    root = TreeNode(id=-1, value=-np.inf, children=roots)
    parents, weights = find_nodes_before(root, 4.5)
    assert parents == [n4]

    # threshold below all roots: root itself is the parent
    parents, weights = find_nodes_before(root, 0.5)
    assert parents == [root]
    assert weights == [1]


def test_pointpile_growth():
    pp = PointPile(2, 3, chunksize=4)
    for i in range(20):
        idx = pp.add([i, i], [i, i, i])
        assert idx == i
    np.testing.assert_array_equal(pp.getu(7), [7, 7])
    np.testing.assert_array_equal(pp.getp(19), [19, 19, 19])


def test_replay_vectorized_parity():
    """The vectorized replay must reproduce the sequential replay exactly.

    Covers both volume modes (deterministic and beta-sampled shrinkage,
    sharing the RNG stream), all results fields, the per-iteration
    sequence arrays, and the MWW insertion-order bookkeeping.
    """
    for random in [False, True]:
        root, pp = make_simple_run(nlive=40, niter=400)
        np.random.seed(5)
        seq_f, res_f = logz_sequence(root, pp, nbootstraps=10, random=random)
        np.random.seed(5)
        seq_s, res_s = logz_sequence(root, pp, nbootstraps=10, random=random,
                                     onNode=lambda n, i: None)
        for k in ['logz', 'logzerr', 'logz_bs', 'logzerr_bs', 'H', 'Herr',
                  'ess', 'logzerr_tail']:
            assert np.isclose(res_f[k], res_s[k], rtol=1e-9, atol=1e-12,
                              equal_nan=True), (random, k, res_f[k], res_s[k])
        for k in ['logz', 'logzerr', 'logvol', 'logwt', 'insert_order',
                  'nlive']:
            np.testing.assert_allclose(
                np.asarray(seq_f[k], float), np.asarray(seq_s[k], float),
                rtol=1e-9, equal_nan=True, err_msg=k)
        np.testing.assert_allclose(res_f['weighted_samples']['weights'],
                                   res_s['weighted_samples']['weights'],
                                   rtol=1e-9)
        assert res_f['insertion_order_MWW_test'] == \
            res_s['insertion_order_MWW_test']


def test_native_counter_parity():
    """C counter kernel must match the numpy reference implementation."""
    from ultranest_tpu import native
    if not native.available():
        import pytest
        pytest.skip('native kernels unavailable')
    root, pp = make_simple_run(nlive=40, niter=300)
    roots = root.children

    def run(force_py):
        mc = MultiCounter(nroots=len(roots), nbootstraps=8, random=False,
                          check_insertion_order=True,
                          rng=np.random.RandomState(4))
        explorer = BreadthFirstIterator(roots)
        while True:
            nn = explorer.next_node()
            if nn is None:
                break
            rootid, node, (_, active_rootids, active_values, _) = nn
            if force_py:
                mc._passing_node_py(rootid, node, active_rootids,
                                    active_values)
            else:
                mc._passing_node_native(rootid, node, active_rootids,
                                        active_values)
            explorer.expand_children_of(rootid, node)
        return mc

    a, b = run(False), run(True)
    np.testing.assert_allclose(a.all_logZ, b.all_logZ, rtol=1e-12)
    np.testing.assert_allclose(a.all_H, b.all_H, rtol=1e-10, equal_nan=True)
    np.testing.assert_allclose(a.all_logVolremaining, b.all_logVolremaining,
                               rtol=1e-12)
    np.testing.assert_allclose(a.all_logZremain, b.all_logZremain,
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(a.logweights),
                               np.asarray(b.logweights), rtol=1e-12)
    assert a.istail == b.istail
    assert np.array_equal(a._nlive, b._nlive)
    for attr in ['logZ', 'logZerr', 'logVolremaining', 'logZremain',
                 'logZremainMax', 'remainder_fraction']:
        assert np.isclose(getattr(a, attr), getattr(b, attr), rtol=1e-10), \
            attr
    assert a.insertion_order_runs == b.insertion_order_runs
    assert len(a.insertion_order_accumulator) == \
        len(b.insertion_order_accumulator)


def test_native_sweep_parity():
    """C tree sweep must match the python sweep, incl. plateaus/ties.

    Builds a randomized tree with forks (multi-child), leaves, and
    duplicated values (plateaus), and compares every output of the
    native consume-min sweep against the python reference, including
    the folded-in insertion-order U-test accumulation.
    """
    from ultranest_tpu import native
    from ultranest_tpu.netiter import (_sweep_tree_native,
                                       _sweep_tree_sequence)
    if not native.available():
        import pytest
        pytest.skip('native kernels unavailable')
    rng = np.random.default_rng(7)
    pp = PointPile(1, 1)
    values = rng.normal(size=25)
    values[5] = values[3]  # root-level plateau
    roots = [pp.make_node(v, [rng.random()], [rng.random()])
             for v in values]
    nodes = list(roots)
    for _ in range(600):
        n = nodes[rng.integers(len(nodes))]
        if len(n.children) >= 3:
            continue
        r = rng.random()
        if r < 0.1 and n.children:
            # duplicate an existing child's value: interior plateau
            newv = n.children[0].value
        else:
            newv = n.value + abs(rng.normal()) + 1e-9
        c = pp.make_node(newv, [rng.random()], [rng.random()])
        n.children.append(c)
        nodes.append(c)

    ref = _sweep_tree_sequence(roots)
    mi_nat = MultiCounter(nroots=len(roots), nbootstraps=4, random=False,
                          check_insertion_order=True)
    nat = _sweep_tree_native(roots, mi_nat)
    assert nat is not None
    names = ['Ls', 'ids', 'nchildren', 'rootid', 'nact', 'cio']
    for name, a, b in zip(names, ref[:6], nat[:6]):
        np.testing.assert_array_equal(a, b, err_msg=name)
    np.testing.assert_allclose(ref[7][-1:], nat[7])

    # replicate the python-side U-test accumulation
    mi_py = MultiCounter(nroots=len(roots), nbootstraps=4, random=False,
                         check_insertion_order=True)
    acc = mi_py.insertion_order_accumulator
    thr = mi_py.insertion_order_threshold
    for rlist, n in zip(ref[6], ref[4]):
        for r in rlist:
            acc.add(r, n)
            if abs(acc.zscore) > thr:
                mi_py.insertion_order_runs.append(len(acc))
                acc.reset()
    assert mi_nat.insertion_order_runs == mi_py.insertion_order_runs
    acc_nat = mi_nat.insertion_order_accumulator
    assert acc_nat.N == acc.N
    assert np.isclose(acc_nat.U, acc.U, rtol=1e-12, atol=1e-12)


def test_fn_fingerprint_array_closures():
    """Closures over equal numpy arrays share a kernel-cache identity."""
    from ultranest_tpu.fused import _fn_fingerprint

    def make(scale_arr, offset):
        def fn(x):
            return (x * scale_arr).sum() + offset
        return fn

    a1 = make(np.arange(5.0), 2.0)
    a2 = make(np.arange(5.0), 2.0)
    b = make(np.arange(5.0) + 1, 2.0)
    assert _fn_fingerprint(a1) == _fn_fingerprint(a2)
    assert _fn_fingerprint(a1) != _fn_fingerprint(b)
    assert not callable(_fn_fingerprint(a1))

    # unfingerprintable closures (unhashable captures) fall back to
    # identity rather than raising
    state = {'calls': 0}

    def weird(x):
        state['calls'] += 1
        return x
    assert _fn_fingerprint(weird) is weird


def test_native_replay_parity():
    """C counter replay must match the numpy matrix replay.

    Compares results and full sequences for both shrinkage modes with
    the native path enabled vs force-disabled, sharing the RNG seed.
    """
    import os
    from ultranest_tpu import native
    if not native.available():
        import pytest
        pytest.skip('native kernels unavailable')
    from ultranest_tpu.netiter import logz_sequence as lzs
    root, pp = make_simple_run(nlive=60, niter=2000)
    for random in (False, True):
        np.random.seed(11)
        seq_n, res_n = lzs(root, pp, nbootstraps=8, random=random)
        os.environ['ULTRANEST_TPU_NO_NATIVE'] = '1'
        native._LIB = None
        try:
            np.random.seed(11)
            seq_p, res_p = lzs(root, pp, nbootstraps=8, random=random)
        finally:
            del os.environ['ULTRANEST_TPU_NO_NATIVE']
            native._LIB = None
        for k in ['logz', 'logzerr', 'H', 'Herr', 'ess', 'logz_bs',
                  'logzerr_bs', 'logzerr_tail']:
            assert np.isclose(res_n[k], res_p[k], rtol=1e-9, atol=1e-12,
                              equal_nan=True), (random, k)
        for k in ['logz', 'logzerr', 'logvol', 'logwt', 'insert_order',
                  'nlive', 'weights']:
            np.testing.assert_allclose(
                np.asarray(seq_n[k], float), np.asarray(seq_p[k], float),
                rtol=1e-8, atol=1e-12, equal_nan=True, err_msg=k)
        assert res_n['insertion_order_MWW_test'] == \
            res_p['insertion_order_MWW_test']
