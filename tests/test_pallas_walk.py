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


def test_pallas_segment_consume_matches_xla():
    """The in-kernel consume phase reproduces segmentops.consume_scan.

    Setup forces a deterministic, fully-accepting walk even under the
    interpreter's zero RNG: the likelihood is constant 0.0 and the live
    values all sit below it, so every walker finishes and every
    harvested row is a valid candidate. The packed records (accept,
    worst slot, Lmin, rank, plateau/dup flags) and the updated live
    state must equal the XLA consume scan run on the same harvest.
    """
    from ultranest_tpu.ops.pallas_walk import build_segment_pallas
    from ultranest_tpu.segmentops import consume_scan, pack_segment

    P, ndim, nsteps, D, nlive, npad = 128, 4, 2, 4, 50, 64

    def flat_loglike(t):
        return jnp.zeros(t.shape[0])

    rng = np.random.RandomState(1)
    lu = rng.rand(nlive, ndim).astype(np.float32)
    lL = np.linspace(-1.0, -0.5, nlive).astype(np.float32)
    lu_p = np.concatenate([lu, np.zeros((npad - nlive, ndim), np.float32)])
    lL_p = np.concatenate([lL, np.full(npad - nlive, np.inf, np.float32)])
    axes = np.eye(ndim, dtype=np.float32) * 0.1

    with pltpu.force_tpu_interpret_mode():
        run = build_segment_pallas(flat_loglike, lambda u: u, P, ndim,
                                   npad, nsteps, D,
                                   max_rounds=nsteps * 16, target_done=P)
        tpack = np.vstack([np.eye(ndim, dtype=np.float32),
                           np.zeros((1, ndim), np.float32)])
        lu2, lL2, packed = run(jax.random.PRNGKey(0), lu_p, lL_p,
                               nlive, axes, 1.0, tpack)
    lu2, lL2, packed = map(np.asarray, (lu2, lL2, packed))
    rows, scal = packed[:-1], packed[-1]
    assert scal[1] == 1.0, 'every walker must have finished'

    uf = rows[:, :ndim]
    Lf = rows[:, ndim]
    lu2_x, lL2_x, recs_x = consume_scan(
        jnp.asarray(lu_p), jnp.asarray(lL_p), jnp.asarray(uf),
        jnp.asarray(Lf), jnp.ones(P, jnp.float32))
    packed_x = np.asarray(pack_segment(
        jnp.asarray(uf), jnp.asarray(Lf), recs_x,
        scal[0], scal[1], scal[2]))

    # columns [u, L, RECORD_COLS] must match the XLA consume exactly;
    # the trailing jump2 column (whitened squared chain travel, reduced
    # on device from the chain-start block) is checked structurally:
    # with identity whitening it must equal the squared distance from
    # the final point to SOME live point (the chain start)
    np.testing.assert_array_equal(rows[:, :ndim + 6], packed_x[:-1])
    jump2 = rows[:, ndim + 6]
    assert rows.shape[1] == ndim + 7
    d2_all = ((uf[:, None, :] - lu_p[None, :nlive, :]) ** 2).sum(axis=2)
    close = np.isclose(d2_all, jump2[:, None], rtol=1e-4, atol=1e-6)
    assert close.any(axis=1).all(), \
        'jump2 must be the squared distance to the chain-start live point'
    np.testing.assert_array_equal(np.asarray(lL2_x), lL2)
    np.testing.assert_array_equal(np.asarray(lu2_x), lu2)
    # the flat likelihood fills the live set with equal values: the
    # later records must carry the duplicate/plateau flags
    assert (rows[:, ndim + 5] >= 1).any()


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
