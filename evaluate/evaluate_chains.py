"""Chain-convergence diagnostics from a step-sampler chain log.

Reads the raw per-chain rows written by ``StepSampler(log=open(...))``
(`ultranest_tpu/stepsampler.py::_write_chain_log`; row layout
``[Lmin, ustart(d), uend(d), tstart(d), tend(d), nsteps, maxradius,
mean_pair_distance, rankstart, rankend, nnstart, nnend]``) and reports
the reference's convergence criteria
(`/root/reference/examples/evaluate_evolution.py`):

* likelihood-rank change between chain start and end — a converged
  chain forgets its start, so the end rank is uniform over the live set;
* whitened start-to-end distance vs the MLFriends radius — converged
  chains move further than one radius;
* start-to-end direction angle in whitened space — near-orthogonal
  (~90 deg) for independent endpoints;
* same-nearest-neighbour rate — should be rare.

Usage::

    python evaluate/evaluate_chains.py chains.txt [more.txt ...]
"""
import sys

import numpy as np


def analyse(filename):
    data = np.loadtxt(filename)
    if data.ndim == 1:
        data = data[None, :]
    if data.size == 0 or data.shape[1] < 12:
        print('%s: no complete chain rows' % filename)
        return 'empty'
    ndim = (data.shape[1] - 1 - 7) // 4
    ustart = data[:, 1 + ndim * 0:1 + ndim * 1]
    uend = data[:, 1 + ndim * 1:1 + ndim * 2]
    tstart = data[:, 1 + ndim * 2:1 + ndim * 3]
    tend = data[:, 1 + ndim * 3:1 + ndim * 4]
    (nsteps, maxradius, mean_pair_distance, rankstart, rankend,
     nnstart, nnend) = data[:, 1 + ndim * 4:].T

    dist = np.linalg.norm(tend - tstart, axis=1)
    moved_far = dist > maxradius
    with np.errstate(invalid='ignore'):
        # signed cosine: converged endpoints are independent directions
        # from the whitened center, so the angle is uniform around 90
        cosang = ((tstart * tend).sum(axis=1)
                  / np.maximum(np.linalg.norm(tstart, axis=1)
                               * np.linalg.norm(tend, axis=1), 1e-300))
    angle = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
    drank = np.abs(rankend - rankstart)
    same_nn = nnstart == nnend

    print('%s: %d chains, ndim=%d, nsteps=%.0f..%.0f' % (
        filename, len(data), ndim, nsteps.min(), nsteps.max()))
    print('  |rank change|      : median %.0f  (converged: ~N_live/3.41)'
          % np.median(drank))
    print('  dist > maxradius   : %.0f%%  (converged: ~100%%)'
          % (100 * moved_far.mean()))
    print('  start-end angle    : median %.0f deg (converged: ~90)'
          % np.median(angle))
    print('  same nearest nbr   : %.1f%%  (converged: rare)'
          % (100 * same_nn.mean()))
    verdict = 'converged' if (moved_far.mean() > 0.9
                              and same_nn.mean() < 0.1) else \
        'NOT converged: increase nsteps'
    print('  verdict            : %s' % verdict)
    return verdict


if __name__ == '__main__':
    for fn in sys.argv[1:]:
        analyse(fn)
