#!/usr/bin/env python
"""Benchmark: eggbox problem (reference examples/testeggbox.py) end-to-end.

Runs the reactive nested sampler with the fused TPU proposal path on the
eggbox likelihood until the standard termination criteria (dlogz=0.5,
frac_remain=0.01), checks logZ against a quadrature reference, and reports
likelihood evaluations per second. The baseline is the same framework run
on the host CPU backend (same algorithm, same machine), measured in a
subprocess.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '.jax_cache')

RUN_KWARGS = dict(min_num_live_points=400, viz_callback=False,
                  show_status=False, max_num_improvement_loops=0,
                  min_ess=0, dlogz=0.5, frac_remain=0.1, Lepsilon=0.001,
                  max_ncalls=400000)


def _heartbeat(points=None, info=None, **kw):
    print("bench: it=%d ncall=%d logz=%.1f" % (
        info['it'], info['ncall'], info['logz']), file=sys.stderr, flush=True)


def eggbox_logz_expected():
    """Quadrature reference for the eggbox logZ."""
    n = 4000
    x = (np.arange(n) + 0.5) / n * 10 * np.pi
    chi = np.outer(np.cos(x / 2), np.cos(x / 2))
    logl = (2 + chi) ** 5
    m = logl.max()
    return float(np.log(np.exp(logl - m).mean()) + m)


def run_bench(platform=None, seed=42):
    """Run the eggbox benchmark; returns a stats dict."""
    if platform:
        os.environ['JAX_PLATFORMS'] = platform
    import jax
    if platform:
        jax.config.update('jax_platforms', platform)
    try:
        jax.config.update('jax_compilation_cache_dir', CACHE_DIR)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from ultranest_tpu import ReactiveNestedSampler

    def loglike(z):
        chi = np.cos(z[:, 0] / 2) * np.cos(z[:, 1] / 2)
        return (2 + chi) ** 5

    def transform(x):
        return x * 10 * np.pi

    def jax_loglike(z):
        chi = jnp.cos(z[:, 0] / 2) * jnp.cos(z[:, 1] / 2)
        return (2 + chi) ** 5

    def jax_transform(x):
        return x * 10 * jnp.pi

    on_tpu = jax.default_backend() != 'cpu'
    sampler = ReactiveNestedSampler(
        ['x', 'y'], loglike, transform=transform, vectorized=True,
        seed=seed,
        jax_loglike=jax_loglike if on_tpu else None,
        jax_transform=jax_transform if on_tpu else None,
        # few power-of-two buckets: bounds the jit variants of the fused
        # proposal kernel (remote TPU compiles are expensive)
        ndraw_min=8192 if on_tpu else 128,
        ndraw_max=32768 if on_tpu else 65536)

    t0 = time.time()
    kwargs = dict(RUN_KWARGS)
    if on_tpu:
        kwargs['viz_callback'] = _heartbeat
    results = sampler.run(**kwargs)
    wall = time.time() - t0

    return dict(
        backend=jax.default_backend(),
        wall_s=wall,
        ncall=int(results['ncall']),
        nregioncall=int(sampler.ncall_region),
        niter=int(results['niter']),
        logz=float(results['logz']),
        logzerr=float(results['logzerr']),
        evals_per_s=results['ncall'] / wall,
    )


def main():
    if '--child' in sys.argv:
        # CPU baseline subprocess: same framework, host backend
        stats = run_bench(platform='cpu')
        print('CHILD_RESULT ' + json.dumps(stats))
        return

    expected = eggbox_logz_expected()
    stats = run_bench()
    ok = abs(stats['logz'] - expected) < max(4 * stats['logzerr'], 1.0)

    # CPU baseline in a subprocess (fresh backend selection)
    baseline = None
    try:
        env = dict(os.environ, JAX_PLATFORMS='cpu')
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--child'],
            capture_output=True, text=True, timeout=3600, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in out.stdout.splitlines():
            if line.startswith('CHILD_RESULT '):
                baseline = json.loads(line[len('CHILD_RESULT '):])
    except Exception:
        baseline = None

    vs_baseline = (stats['evals_per_s'] / baseline['evals_per_s']) \
        if baseline else float('nan')

    print(json.dumps({
        'metric': 'eggbox_likelihood_evals_per_s',
        'value': round(stats['evals_per_s'], 1),
        'unit': 'evals/s',
        'vs_baseline': round(vs_baseline, 2) if baseline else None,
        'extra': {
            'backend': stats['backend'],
            'wall_s': round(stats['wall_s'], 2),
            'ncall': stats['ncall'],
            'niter': stats['niter'],
            'logz': round(stats['logz'], 3),
            'logzerr': round(stats['logzerr'], 3),
            'logz_expected': round(expected, 3),
            'logz_ok': bool(ok),
            'baseline_evals_per_s': round(baseline['evals_per_s'], 1)
            if baseline else None,
            'baseline_wall_s': round(baseline['wall_s'], 2)
            if baseline else None,
        },
    }))


if __name__ == '__main__':
    main()
