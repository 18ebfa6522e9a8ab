"""Numerical parity with the reference tree engine (used as an oracle).

The reference's netiter/ordertest modules are pure python and can be
loaded directly from the read-only reference checkout, when present.
These tests feed identical trees and RNG streams through both
implementations and require bit-identical integration results. Where no
reference checkout exists, the recorded oracle outputs committed in
``tests/data/reference_parity.npz`` are asserted against instead (see
tests/parity_fixtures.py), so the gates never silently skip.
"""
import importlib.util
import os
import sys
import types

import numpy as np

from parity_fixtures import REF, expected


def load_reference_netiter():
    """Load the reference netiter with a synthetic package context."""
    pkg = types.ModuleType('refultranest')
    pkg.__path__ = [REF]
    sys.modules['refultranest'] = pkg
    for name in ('ordertest', 'utils', 'netiter'):
        spec = importlib.util.spec_from_file_location(
            'refultranest.' + name, os.path.join(REF, name + '.py'))
        mod = importlib.util.module_from_spec(spec)
        sys.modules['refultranest.' + name] = mod
        spec.loader.exec_module(mod)
    return sys.modules['refultranest.netiter']


def build_tree(netiter_mod, rng):
    """Fixed-N run with occasional forks, same for both implementations."""
    pp = netiter_mod.PointPile(2, 2)
    nlive = 40
    logls = np.sort(rng.uniform(-80, -30, size=nlive))
    roots = [pp.make_node(logl, [rng.uniform(), rng.uniform()],
                          [rng.uniform(), rng.uniform()]) for logl in logls]
    explorer = netiter_mod.BreadthFirstIterator(roots)
    for it in range(300):
        nn = explorer.next_node()
        if nn is None:
            break
        rootid, node, _ = nn
        nchildren = 2 if it % 37 == 5 else 1
        for _ in range(nchildren):
            newL = node.value + rng.uniform(0.01, 3)
            node.children.append(pp.make_node(
                newL, [rng.uniform(), rng.uniform()],
                [rng.uniform(), rng.uniform()]))
        explorer.expand_children_of(rootid, node)
    root = netiter_mod.TreeNode(id=-1, value=-np.inf, children=roots)
    return root, pp


def run_multicounter(netiter_mod, root, nbootstraps, seed, ours):
    """Drive a MultiCounter over the tree; returns its trajectory."""
    import ultranest_tpu.netiter as my_netiter
    roots = root.children
    explorer = netiter_mod.BreadthFirstIterator(roots)
    np.random.seed(seed)
    if ours:
        counter = my_netiter.MultiCounter(
            nroots=len(roots), nbootstraps=nbootstraps, random=False,
            rng=np.random)
    else:
        counter = netiter_mod.MultiCounter(
            nroots=len(roots), nbootstraps=nbootstraps, random=False)
    logz_seq = []
    vol_seq = []
    while True:
        nn = explorer.next_node()
        if nn is None:
            break
        rootid, node, (_, active_rootids, active_values, _) = nn
        if ours:
            # bit-exact oracle compares the numpy reference path; the C
            # kernel differs in the last ulp (libm vs numpy SIMD exp) and
            # is parity-tested at rtol 1e-12 in test_netiter.py
            counter._passing_node_py(rootid, node, active_rootids,
                                     active_values)
        else:
            counter.passing_node(rootid, node, active_rootids, active_values)
        logz_seq.append(counter.logZ)
        vol_seq.append(counter.logVolremaining)
        explorer.expand_children_of(rootid, node)
    return (np.array(logz_seq), np.array(vol_seq), counter.all_logZ.copy(),
            np.array(counter.logweights), counter.all_H.copy())


def test_multicounter_matches_reference_exactly():
    import ultranest_tpu.netiter as my_netiter
    root, _ = build_tree(my_netiter, np.random.RandomState(11))
    mine = run_multicounter(my_netiter, root, nbootstraps=7, seed=99,
                            ours=True)

    def compute_ref():
        ref_netiter = load_reference_netiter()
        ref_root, _ = build_tree(ref_netiter, np.random.RandomState(11))
        return run_multicounter(ref_netiter, ref_root, nbootstraps=7,
                                seed=99, ours=False)

    ref = expected('multicounter', compute_ref, n_outputs=5)
    for a, b, what in zip(ref, mine,
                          ['logz', 'logvol', 'all_logZ', 'logweights',
                           'all_H']):
        np.testing.assert_array_equal(a, b, err_msg=what)


def run_singlecounter(netiter_mod, root):
    explorer = netiter_mod.BreadthFirstIterator(root.children)
    counter = netiter_mod.SingleCounter()
    seq = []
    while True:
        nn = explorer.next_node()
        if nn is None:
            break
        rootid, node, (active_nodes, _, _, _) = nn
        counter.passing_node(node, active_nodes)
        seq.append((counter.logZ, counter.logVolremaining))
        explorer.expand_children_of(rootid, node)
    return np.array(seq)


def test_singlecounter_matches_reference_exactly():
    import ultranest_tpu.netiter as my_netiter
    root, _ = build_tree(my_netiter, np.random.RandomState(13))
    mine = run_singlecounter(my_netiter, root)

    def compute_ref():
        ref_netiter = load_reference_netiter()
        ref_root, _ = build_tree(ref_netiter, np.random.RandomState(13))
        return run_singlecounter(ref_netiter, ref_root)

    ref = expected('singlecounter', compute_ref)
    np.testing.assert_array_equal(ref, mine)


def test_ordertest_matches_reference():
    from ultranest_tpu.ordertest import UniformOrderAccumulator

    rng = np.random.RandomState(3)
    orders = rng.randint(101, size=5000)

    acc_mine = UniformOrderAccumulator()
    mine = []
    for o in orders:
        acc_mine.add(int(o), 100)
        mine.append(acc_mine.zscore)

    def compute_ref():
        spec = importlib.util.spec_from_file_location(
            'ref_ordertest', os.path.join(REF, 'ordertest.py'))
        ref_ot = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_ot)
        acc_ref = ref_ot.UniformOrderAccumulator()
        seq = []
        for o in orders:
            acc_ref.add(int(o), 100)
            seq.append(acc_ref.zscore)
        return np.array(seq)

    ref = expected('ordertest_zscores', compute_ref)
    # zscore formulas differ in op order; agree to round-off
    np.testing.assert_allclose(ref, np.array(mine), rtol=1e-12, atol=1e-12)
