"""Measure the MWW insertion-rank signal on the gauss100_hard anchor.

Question (round-5 governor design): when chains are too short
(nsteps=200 on the 100-d sigma=0.01 gaussian -> logZ biased +2.4), how
strong is the insertion-rank non-uniformity — per 2048-rank window and
cumulatively? Run the same problem at nsteps=400 (unbiased per the
round-3 sweep) for the null distribution.

Usage: python evaluate/mww_signal_study.py [nsteps ...]
Prints one JSON line per nsteps value.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def run(nsteps, seed=3):
    from ultranest_tpu import ReactiveNestedSampler, models
    from ultranest_tpu.mlfriends import ScalingLayer, SimpleRegion
    from ultranest_tpu.popfused import FusedPopulationSliceSampler

    prob = models.gauss(ndim=100, sigma=0.01)
    sampler = ReactiveNestedSampler(seed=seed,
                                    **prob.sampler_kwargs(use_jax=False))
    sampler.transform_layer_class = ScalingLayer
    ss = FusedPopulationSliceSampler(
        popsize=2048, nsteps=nsteps, jax_loglike=prob.jax_loglike,
        seed=seed, engine='spec')
    sampler.stepsampler = ss

    feed = dict(ncalls=0, nranks=0)
    window_z = []
    cum = dict(s=0.0, n=0)

    def observe(ranks, nlive, rec_nsteps=None):
        feed['ncalls'] += 1
        ranks = np.asarray(ranks, float)
        feed['nranks'] += len(ranks)
        norm = (ranks + 0.5) / nlive
        cum['s'] += norm.sum()
        cum['n'] += len(norm)
        acc = ss._mww_acc
        acc.add_many(ranks, nlive)
        if acc.N >= 2048:
            window_z.append(acc.zscore)
            acc.reset()

    ss.observe_insertion_ranks = observe
    t0 = time.time()
    res = sampler.run(
        min_num_live_points=400, viz_callback=False, show_status=False,
        max_num_improvement_loops=0, min_ess=0, dlogz=2.0,
        frac_remain=0.1, region_class=SimpleRegion,
        cluster_num_live_points=0)
    wz = np.array(window_z)
    cum_z = (cum['s'] - 0.5 * cum['n']) / np.sqrt(cum['n'] / 12.0) \
        if cum['n'] else 0.0
    out = dict(
        nsteps=nsteps, seed=seed, wall_s=round(time.time() - t0, 1),
        logz=round(float(res['logz']), 3),
        logzerr=round(float(res['logzerr']), 3),
        feed_calls=feed['ncalls'], nranks=feed['nranks'],
        cumulative_z=round(float(cum_z), 2),
        window_z_mean=round(float(wz.mean()), 3) if len(wz) else None,
        window_z_max=round(float(np.abs(wz).max()), 2) if len(wz) else None,
        window_z=[round(float(z), 2) for z in wz])
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    for n in [int(a) for a in sys.argv[1:]] or [200, 400]:
        run(n)
