"""Tests for the fused Pallas spec-walk megakernel.

Runs in the TPU interpreter (``pltpu.force_tpu_interpret_mode``) on the
CPU suite. CAVEAT: the interpreter stubs ``pltpu.prng_random_bits`` to
zeros, so these tests exercise the kernel's *structure* (lowering,
state machine, billing, output packing) under a degenerate RNG stream;
the statistical comparison against the XLA walk and the timing run
on-chip in ``evaluate/bench_pallas_walk.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultranest_tpu.ops.pallas_walk import build_spec_walk_pallas

pltpu = pytest.importorskip('jax.experimental.pallas.tpu')


def _loglike(t):
    return -0.5 * (((t - 0.5) / 0.2) ** 2).sum(axis=1)


def _setup(nlive=100, npad=128, ndim=8):
    rng = np.random.RandomState(0)
    lu = rng.rand(nlive, ndim).astype(np.float32)
    lL = np.asarray(_loglike(jnp.asarray(lu)))
    lu_p = np.concatenate([lu, np.zeros((npad - nlive, ndim), np.float32)])
    lL_p = np.concatenate([lL, np.full(npad - nlive, np.inf, np.float32)])
    axes = np.eye(ndim, dtype=np.float32) * 0.1
    return lu_p, lL_p, axes, float(lL.min())


def test_pallas_walk_structure():
    """Kernel traces, runs, and respects the walk's invariants.

    Under the interpreter's all-zero RNG every uniform is 0.0: all
    walkers start from live point 0, every slice draw lands on the
    current left bracket edge, and directions are the (0,1) DE pair.
    The invariants that must hold regardless: output shapes, finite
    likelihoods, the cube bound on accepted positions, exact billing
    (D rows per active walker per round), and termination through
    either completion or the round cap.
    """
    P, ndim, nsteps, D, nlive, npad = 256, 8, 8, 4, 100, 128
    max_rounds = nsteps * 16
    lu_p, lL_p, axes, Lmin = _setup(nlive, npad, ndim)
    with pltpu.force_tpu_interpret_mode():
        walk = build_spec_walk_pallas(
            _loglike, lambda u: u, P, ndim, npad, nsteps, D,
            max_rounds=max_rounds, target_done=P)
        uf, Lf, done, idx0, nc, width = walk(
            jax.random.PRNGKey(5), lu_p, lL_p, nlive, axes, Lmin, 1.0)
        # raw uint32 key-data arrays (the sampler's host key stream)
        # are accepted too
        uf_raw, *_ = walk(np.asarray([7, 9], np.uint32), lu_p, lL_p,
                          nlive, axes, Lmin, 1.0)
    uf, Lf, done, idx0 = map(np.asarray, (uf, Lf, done, idx0))
    assert uf.shape == (P, ndim) and Lf.shape == (P,)
    assert np.isfinite(Lf).all()
    assert ((uf >= 0) & (uf <= 1)).all()
    assert (idx0 >= 0).all() and (idx0 < nlive).all()
    nc = float(nc)
    assert nc % D == 0 and D * P <= nc <= D * P * max_rounds
    assert np.isfinite(np.asarray(uf_raw)).all()
    if done.all():
        assert (Lf > Lmin).all()


def test_pallas_walk_engine_selected():
    """With the env flag on, _build_spec swaps in the Pallas walk."""
    from ultranest_tpu.popfused import FusedPopulationSliceSampler
    ss = FusedPopulationSliceSampler(popsize=64, nsteps=2,
                                     jax_loglike=_loglike, seed=1)
    xla_walk = ss._build_spec(64, 4, walk_only=True)
    assert xla_walk.__name__ == 'spec_walk'
    try:
        import os
        os.environ['ULTRANEST_TPU_PALLAS_WALK'] = '1'
        # cpu backend: pallas_walk_enabled() must refuse
        walk = ss._build_spec(64, 4, walk_only=True)
        assert walk.__name__ == 'spec_walk'
    finally:
        os.environ.pop('ULTRANEST_TPU_PALLAS_WALK', None)
