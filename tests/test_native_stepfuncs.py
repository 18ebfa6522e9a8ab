"""Parity of the C slice-update kernel vs the numpy reference loop."""
import numpy as np
import pytest

from ultranest_tpu import native
from ultranest_tpu.ops import stepfuncs


def _random_state(rng, popsize, npoints, ndim):
    t = rng.uniform(-1, 1, popsize)
    tleft = -rng.uniform(0.2, 1.0, npoints)
    tright = rng.uniform(0.2, 1.0, npoints)
    proposed_L = rng.uniform(-2, 2, popsize)
    proposed_u = rng.uniform(size=(popsize, ndim))
    proposed_p = rng.uniform(size=(popsize, ndim + 1))
    worker_running = rng.randint(npoints, size=popsize).astype(np.int64)
    status = (rng.uniform(size=npoints) < 0.3).astype(np.int64)
    allu = np.zeros((npoints, ndim))
    allL = np.full(npoints, -np.inf)
    allp = np.zeros((npoints, ndim + 1))
    return dict(t=t, tleft=tleft, tright=tright, proposed_L=proposed_L,
                proposed_u=proposed_u, proposed_p=proposed_p,
                worker_running=worker_running, status=status,
                allu=allu, allL=allL, allp=allp)


def _copy(d):
    return {k: v.copy() for k, v in d.items()}


@pytest.mark.skipif(not native.available(), reason='no native library')
@pytest.mark.parametrize('seed', [1, 2, 3, 4])
def test_slice_update_matches_numpy(seed):
    rng = np.random.RandomState(seed)
    popsize, npoints, ndim = 64, 40, 3
    a = _random_state(rng, popsize, npoints, ndim)
    b = _copy(a)

    # C path via the public dispatcher
    outs_c = stepfuncs.update_vectorised_slice_sampler(
        a['t'], a['tleft'], a['tright'], a['proposed_L'],
        a['proposed_u'], a['proposed_p'], a['worker_running'],
        a['status'], 0.0, 0.9, a['allu'], a['allL'], a['allp'], popsize)

    # numpy reference: force the fallback by hiding the library
    import ultranest_tpu.native as nat
    orig = nat.available
    nat.available = lambda: False
    try:
        outs_py = stepfuncs.update_vectorised_slice_sampler(
            b['t'], b['tleft'], b['tright'], b['proposed_L'],
            b['proposed_u'], b['proposed_p'], b['worker_running'],
            b['status'], 0.0, 0.9, b['allu'], b['allL'], b['allp'],
            popsize)
    finally:
        nat.available = orig

    names = ['tleft', 'tright', 'worker_running', 'status', 'allu',
             'allL', 'allp', 'discarded']
    for name, x, y in zip(names, outs_c, outs_py):
        np.testing.assert_array_equal(x, y, err_msg=name)
