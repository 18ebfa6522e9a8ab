"""On-chip shootout: XLA spec walk vs the fused Pallas megakernel.

The XLA spec engine's shrink round costs ~330 us on one v5e chip and no
single op dominates (measured: removing the direction-bank gather saves
14%, removing the likelihood makes it slower) — the while-loop body is
op-dispatch bound. The Pallas megakernel keeps all walker state in VMEM
and draws directions from the in-kernel PRNG.

Checks, at the 50-d headline shape (P=4096, nsteps=100, D=4):

1. wall per dispatch + per round, both engines;
2. seed-stream sanity (different keys -> different harvests; the
   interpreter stubs prng_random_bits to zeros, so this only runs here);
3. statistical agreement of the harvest (per-axis means, mean L).

Usage: ``python evaluate/bench_pallas_walk.py [P] [ndim] [nsteps]``
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp


_SIGMA = {}


def loglike(t):
    # numpy-constant sigma (like models/problems.py): jnp.linspace traces
    # to an f32 iota, which Mosaic cannot lower inside a Pallas kernel
    d = t.shape[1]
    if d not in _SIGMA:
        _SIGMA[d] = np.linspace(0.01, 0.1, d).astype(np.float32)
    return -0.5 * (((t - 0.5) / _SIGMA[d]) ** 2).sum(axis=1)


def main(P=4096, ndim=50, nsteps=100):
    from ultranest_tpu.ops.pairwise import round_up
    from ultranest_tpu.ops.pallas_walk import build_spec_walk_pallas
    from ultranest_tpu.popfused import FusedPopulationSliceSampler

    nlive = 400
    npad = round_up(nlive)
    rng = np.random.RandomState(0)
    lu = (0.4 + 0.2 * rng.rand(nlive, ndim)).astype(np.float32)
    lL = np.asarray(loglike(jnp.asarray(lu)))
    lu_p = np.concatenate([lu, np.zeros((npad - nlive, ndim), np.float32)])
    lL_p = np.concatenate([lL, np.full(npad - nlive, np.inf, np.float32)])
    axes = np.eye(ndim, dtype=np.float32) * 0.1
    Lmin = float(lL.min())
    treg = jnp.zeros(1, jnp.float32)      # no-tregion dummy pack
    args = (jnp.asarray(lu_p), jnp.asarray(lL_p), nlive,
            jnp.asarray(axes), Lmin, 1.0)

    ss = FusedPopulationSliceSampler(popsize=P, nsteps=nsteps,
                                     jax_loglike=loglike, seed=3)
    xla_walk = jax.jit(ss._build_spec(npad, ndim, walk_only=True))
    pwalk = jax.jit(build_spec_walk_pallas(
        loglike, lambda u: u, P, ndim, npad, nsteps, ss.spec_depth,
        max_rounds=nsteps * max(4, (ss.max_it + ss.spec_depth - 1)
                                // ss.spec_depth),
        target_done=P))

    def run(walk, seed, with_treg):
        t0 = time.time()
        extra = (treg,) if with_treg else ()
        out = walk(jax.random.PRNGKey(seed), *args, *extra)
        out[0].block_until_ready()
        return out, time.time() - t0

    results = {}
    for name, walk in [('xla', xla_walk), ('pallas', pwalk)]:
        with_treg = name == 'xla'        # XLA walk takes the treg pack
        t0 = time.time()
        out, _ = run(walk, 0, with_treg)
        print('%-7s compile+run %.1f s' % (name, time.time() - t0))
        ts, outs = [], []
        for seed in (1, 2, 3):
            out, dt = run(walk, seed, with_treg)
            outs.append([np.asarray(o) for o in out])
            ts.append(dt)
        nc = float(outs[0][4])
        rounds = nc / (P * ss.spec_depth)  # lower bound (active billing)
        print('%-7s %7.1f ms/dispatch  nc=%.2g  (~%.0f+ rounds, '
              '<=%.0f us/round)' % (name, 1e3 * min(ts), nc, rounds,
                                    1e6 * min(ts) / max(rounds, 1)))
        results[name] = outs

    # seed-stream sanity for the in-kernel PRNG
    a = results['pallas'][0][0]
    b = results['pallas'][1][0]
    print('pallas seed streams differ:', not np.allclose(a, b))

    # statistical agreement: per-axis means of the harvest
    ux = np.concatenate([o[0] for o in results['xla']])
    up = np.concatenate([o[0] for o in results['pallas']])
    Lx = np.concatenate([o[1] for o in results['xla']])
    Lp = np.concatenate([o[1] for o in results['pallas']])
    se = np.sqrt(ux.var(axis=0) / len(ux) + up.var(axis=0) / len(up))
    z = np.abs(ux.mean(axis=0) - up.mean(axis=0)) / np.maximum(se, 1e-12)
    seL = np.sqrt(Lx.var() / len(Lx) + Lp.var() / len(Lp))
    zL = abs(Lx.mean() - Lp.mean()) / max(seL, 1e-12)
    print('per-axis mean |z|: max %.2f (expect < ~4)' % z.max())
    print('mean-L z: %.2f   (xla %.2f, pallas %.2f)'
          % (zL, Lx.mean(), Lp.mean()))
    done_x = np.concatenate([o[2] for o in results['xla']])
    done_p = np.concatenate([o[2] for o in results['pallas']])
    print('done frac: xla %.3f pallas %.3f'
          % (done_x.mean(), done_p.mean()))

    # ---- full segment dispatch (walk + consume) ----
    from ultranest_tpu.ops.pallas_walk import build_segment_pallas
    xla_seg = ss._build_spec(npad, ndim, segment=True)
    pseg = jax.jit(build_segment_pallas(
        loglike, lambda u: u, P, ndim, npad, nsteps, ss.spec_depth,
        max_rounds=nsteps * max(4, (ss.max_it + ss.spec_depth - 1)
                                // ss.spec_depth),
        target_done=P))
    # whitening pack: identity T + no wrapped dims (jump2 diagnostics)
    tpack = jnp.asarray(np.vstack([np.eye(ndim, dtype=np.float32),
                                   np.zeros((1, ndim), np.float32)]))
    seg_args = (jnp.asarray(lu_p), jnp.asarray(lL_p), np.int32(nlive),
                jnp.asarray(axes), np.float32(1.0))
    for name, seg in [('xla-seg', xla_seg), ('pallas-seg', pseg)]:
        # XLA segment kernel: (..., treg, tpack); Pallas: (..., tpack)
        extra = (treg, tpack) if name == 'xla-seg' else (tpack,)
        t0 = time.time()
        out = seg(jax.random.PRNGKey(0), *seg_args, *extra)
        out[2].block_until_ready()
        print('%-10s compile+run %.1f s' % (name, time.time() - t0))
        ts = []
        for seed in (1, 2, 3):
            t0 = time.time()
            out = seg(jax.random.PRNGKey(seed), *seg_args, *extra)
            out[2].block_until_ready()
            ts.append(time.time() - t0)
        packed = np.asarray(out[2])
        print('%-10s %7.1f ms/dispatch  (consumed %.0f rows, nc %.2g)'
              % (name, 1e3 * min(ts), packed[:-1, ndim + 1].sum(),
                 packed[-1, 0]))


if __name__ == '__main__':
    argv = [int(a) for a in sys.argv[1:]]
    main(*argv)
