"""Which per-dispatch diagnostic separates too-short from long-enough
chains on the 100-d sigma=0.01 gaussian?

Round-5 finding (evaluate/mww_signal_study.py): the MWW insertion-rank
U-test does NOT separate nsteps=200 (logZ biased +2.7) from nsteps=400
(unbiased) — both show the same small positive rank drift. This script
records the jump-distance diagnostics the engines already compute
(far-enough fraction, geometric-mean relative jump) across nsteps, to
locate a threshold that does separate.

Usage: python evaluate/governor_signal_study.py [nsteps ...]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def run(nsteps, seed=3, sigma=0.01):
    from ultranest_tpu import ReactiveNestedSampler, models
    from ultranest_tpu.mlfriends import ScalingLayer, SimpleRegion
    from ultranest_tpu.popfused import FusedPopulationSliceSampler

    prob = models.gauss(ndim=100, sigma=sigma)
    sampler = ReactiveNestedSampler(seed=seed,
                                    **prob.sampler_kwargs(use_jax=False))
    sampler.transform_layer_class = ScalingLayer
    ss = FusedPopulationSliceSampler(
        popsize=2048, nsteps=nsteps, jax_loglike=prob.jax_loglike,
        seed=seed, engine='spec')
    sampler.stepsampler = ss
    t0 = time.time()
    res = sampler.run(
        min_num_live_points=400, viz_callback=False, show_status=False,
        max_num_improvement_loops=0, min_ess=0, dlogz=2.0,
        frac_remain=0.1, region_class=SimpleRegion,
        cluster_num_live_points=0)
    arr = np.asarray(ss.logstat, float)
    lab = ss.logstat_labels
    far = arr[:, lab.index('far_enough')]
    rj = arr[:, lab.index('mean_rel_jump')]
    out = dict(
        nsteps=nsteps, sigma=sigma, seed=seed,
        wall_s=round(time.time() - t0, 1),
        logz=round(float(res['logz']), 3),
        logzerr=round(float(res['logzerr']), 3),
        far_mean=round(float(np.nanmean(far)), 3),
        far_q10=round(float(np.nanquantile(far, 0.1)), 3),
        far_min=round(float(np.nanmin(far)), 3),
        reljump_gm=round(float(np.nanmean(rj)), 3),
        reljump_q10=round(float(np.nanquantile(rj, 0.1)), 3),
        reljump_min=round(float(np.nanmin(rj)), 3),
        far_seq=[round(float(v), 2) for v in far[::max(1, len(far) // 40)]],
        rj_seq=[round(float(v), 2) for v in rj[::max(1, len(rj) // 40)]])
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    args = sys.argv[1:]
    sigma = 0.01
    if args and args[0] == '--sigma':
        sigma = float(args[1])
        args = args[2:]
    for n in [int(a) for a in args] or [100, 200, 400]:
        run(n, sigma=sigma)
