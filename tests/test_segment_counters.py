"""Parity of the vectorized segment counter advance vs the sequential path.

`MultiCounter.passing_segment` must reproduce `passing_node` exactly
(deterministic shrinkage) over pure-replacement segments, including
carried-in state, bootstrap masks, H information and tail estimates.
"""
import numpy as np
import pytest

from ultranest_tpu.netiter import MultiCounter, PointPile, TreeNode


def _simulate(nroots, nboot, niter, seed, segment_every=None):
    """Run a synthetic fixed-nlive replacement process through a counter.

    Returns the counter plus the per-step (Li, rootid, logsumexp) logs.
    """
    rng = np.random.RandomState(seed)
    mc = MultiCounter(nroots=nroots, nbootstraps=nboot, random=False,
                      rng=np.random.RandomState(seed + 1))
    live_L = np.sort(rng.uniform(-100, -90, nroots))
    live_root = np.arange(nroots)
    pile = PointPile(2, 2)

    seqs = dict(Li=[], rootid=[], lse=[], mc=mc)
    for it in range(niter):
        worst = int(np.argmin(live_L))
        Lmin = live_L[worst]
        Lnew = Lmin + rng.exponential(0.5) + 1e-3
        seqs['Li'].append(Lmin)
        seqs['rootid'].append(live_root[worst])
        m = live_L.max()
        seqs['lse'].append(m + np.log(np.exp(live_L - m).sum()))
        if segment_every is None:
            # sequential reference: one passing_node per consumed node
            node = TreeNode(value=Lmin, id=it)
            node.children.append(pile.make_node(Lnew, np.zeros(2),
                                                np.zeros(2)))
            mc.passing_node(live_root[worst], node, live_root, live_L)
        live_L[worst] = Lnew
    return seqs


@pytest.mark.parametrize('nboot', [0, 7])
@pytest.mark.parametrize('split', [(40,), (17, 23), (1, 38, 1)])
def test_passing_segment_matches_sequential(nboot, split):
    nroots, niter, seed = 25, 40, 42
    ref = _simulate(nroots, nboot, niter, seed)
    mref = ref['mc']

    got = _simulate(nroots, nboot, 0, seed)  # counters untouched
    m = got['mc']
    # seed the live counts the way passing_node's first call does
    m._nlive = m.rootids.sum(axis=1).astype(np.int64)
    Li = np.asarray(ref['Li'])
    roots = np.asarray(ref['rootid'])
    lse = np.asarray(ref['lse'])
    lo = 0
    for size in split:
        hi = lo + size
        z0, zr0 = m.passing_segment(Li[lo:hi], roots[lo:hi], lse[lo:hi],
                                    nlive0=nroots)
        lo = hi
    assert lo == niter

    np.testing.assert_allclose(m.all_logZ, mref.all_logZ, rtol=1e-12)
    np.testing.assert_allclose(m.all_logVolremaining,
                               mref.all_logVolremaining, rtol=1e-12)
    ok = ~np.isnan(mref.all_H)
    np.testing.assert_allclose(m.all_H[ok], mref.all_H[ok],
                               rtol=1e-9, atol=1e-12)
    assert np.isnan(m.all_H[~ok]).all()
    np.testing.assert_allclose(m.logZremain, mref.logZremain, rtol=1e-12)
    np.testing.assert_allclose(m.remainder_fraction,
                               mref.remainder_fraction, rtol=1e-12)
    np.testing.assert_allclose(m.logZerr, mref.logZerr, rtol=1e-9)
    # per-node weight rows match
    np.testing.assert_allclose(np.asarray(m.logweights),
                               np.asarray(mref.logweights), rtol=1e-12)
    # the final per-step sequence equals the final state
    np.testing.assert_allclose(z0[-1], mref.logZ, rtol=1e-12)
    np.testing.assert_allclose(zr0[-1], mref.logZremain, rtol=1e-12)


def test_passing_segment_per_step_sequences():
    """The emitted per-step logZ sequence matches stepwise references."""
    nroots, seed = 30, 7
    ref = _simulate(nroots, 3, 25, seed)
    Li = np.asarray(ref['Li'])
    roots = np.asarray(ref['rootid'])
    lse = np.asarray(ref['lse'])

    got = _simulate(nroots, 3, 0, seed)
    m = got['mc']
    m._nlive = m.rootids.sum(axis=1).astype(np.int64)
    z_all, zr_all = m.passing_segment(Li, roots, lse, nlive0=nroots)

    # re-run split at every prefix: prefix-final equals the sequence
    for cut in [1, 7, 24]:
        g2 = _simulate(nroots, 3, 0, seed)
        m2 = g2['mc']
        m2._nlive = m2.rootids.sum(axis=1).astype(np.int64)
        z2, zr2 = m2.passing_segment(Li[:cut], roots[:cut], lse[:cut],
                                     nlive0=nroots)
        np.testing.assert_allclose(z2[-1], z_all[cut - 1], rtol=1e-12)
        np.testing.assert_allclose(m2.logZ, z_all[cut - 1], rtol=1e-12)
