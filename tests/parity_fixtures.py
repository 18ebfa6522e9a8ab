"""Recorded reference-oracle outputs for the parity gates.

The bit-parity tests (test_reference_parity*.py) compare this package
against the reference implementation. The reference checkout is only
available on the build machine; everywhere else (CI, other checkouts)
those gates used to skip silently. This module freezes the oracle's
outputs into ``tests/data/reference_parity.npz`` — the same pattern the
reference uses for its own golden files (tests/overclustered_*.npz) —
so the parity assertions always run:

- with a reference checkout present, the oracle runs live, its output
  refreshes the committed fixture, and the test asserts against it;
- without one, the committed recording is asserted against instead.

The fixture records *outputs of the reference program* (logZ
trajectories, quantile tables, direction vectors), not reference code.
"""
import os

import numpy as np

REF = os.environ.get('ULTRANEST_TPU_REF', '/root/reference/ultranest')
HAVE_REF = os.path.isdir(REF)
FIXTURE = os.path.join(os.path.dirname(__file__), 'data',
                       'reference_parity.npz')


def _load_all():
    if os.path.exists(FIXTURE):
        with np.load(FIXTURE) as f:
            return {k: f[k] for k in f.files}
    return {}


def expected(name, compute_ref, n_outputs=1):
    """Return the recorded reference-oracle output(s) for *name*.

    Parameters
    ----------
    name: str
        fixture key prefix (one entry per output array)
    compute_ref: callable
        runs the live oracle; only invoked when the reference checkout
        exists. Must return one array (``n_outputs == 1``) or a tuple.
    n_outputs: int
        number of arrays the oracle returns

    Returns
    -------
    one ``np.ndarray``, or a list of them when ``n_outputs > 1``.
    """
    store = _load_all()
    keys = ['%s__%d' % (name, i) for i in range(n_outputs)]
    if HAVE_REF:
        out = compute_ref()
        if n_outputs == 1:
            out = (out,)
        arrs = [np.asarray(a) for a in out]
        assert len(arrs) == n_outputs, (name, len(arrs), n_outputs)
        stale = any(
            k not in store or store[k].shape != a.shape
            or store[k].dtype != a.dtype
            or not np.array_equal(store[k], a)
            for k, a in zip(keys, arrs))
        if stale:
            store.update(zip(keys, arrs))
            os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
            np.savez_compressed(FIXTURE, **store)
        return arrs[0] if n_outputs == 1 else arrs
    missing = [k for k in keys if k not in store]
    if missing:
        raise RuntimeError(
            'parity fixture %s lacks %s and no reference checkout is '
            'available to record it; re-run the suite on a machine with '
            '%s present and commit the refreshed fixture'
            % (FIXTURE, missing, REF))
    return store[keys[0]] if n_outputs == 1 else [store[k] for k in keys]
