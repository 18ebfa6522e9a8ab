# noqa: D400 D205
"""
Pallas TPU kernels for the hot region ops
-----------------------------------------

Hand-scheduled alternatives to the XLA kernels in
:mod:`ultranest_tpu.ops.pairwise` / :mod:`ultranest_tpu.ops.bootstrap`
for the two O(N^2) operations of the region machinery:

* **membership** (`/root/reference/ultranest/mlfriends.pyx:143-183`):
  is each candidate within the MLFriends radius of any live point? The
  kernel keeps the (padded) live points resident in VMEM and streams
  candidate tiles; squared distances accumulate per axis by direct
  differences entirely in VMEM — the XLA scan version round-trips its
  (ndraw, nlive) accumulator through HBM once per dimension.

* **bootstrap radius** (`mlfriends.pyx:188-224` x B rounds): the
  (N, N) distance matrix is computed once into VMEM scratch and all B
  masked min/max rounds reduce over it without ever touching HBM.

Both use direct-difference accumulation rather than the Gram identity:
in f32 the Gram cancellation error (~1e-7 * norm^2) swamps the tiny
squared radii of late-stage regions (see the eggboxregion golden test).

**Status (round-3 re-measurement, one v5e chip —
evaluate/bench_pallas_membership.py):** the membership kernel now WINS
per dispatch at d >= 4 (0.18 vs 0.31 ms XLA at N=512/M=4096/d=16;
0.41 vs 0.52 at N=1024/M=16384/d=8; tie at d=2) but stays **opt-in**
(``ULTRANEST_TPU_PALLAS=1`` for winning shapes, ``force`` for all):
cold Mosaic compiles cost minutes per bucket over the remote-compiler
tunnel vs tens-of-ms steady-state win per run — see the gate rationale
in fused.py. The bootstrap-radius kernel still loses (0.45 vs 0.15 ms
at N=400/B=30/d=2 — one fori_loop invocation cannot pipeline rounds)
and only serves under ``force``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pairwise import pad_rows, round_up

__all__ = ['radius_member_pallas', 'radius_member_traced',
           'bootstrap_radius_pallas', 'pallas_available']

TILE_M = 1024   # candidate rows per grid step
MAX_VMEM_POINTS = 2048  # largest padded live set the kernels keep in VMEM


def pallas_available():
    """Whether the Pallas TPU lowering path is usable on this backend."""
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except ImportError:
        return False
    return jax.default_backend() == 'tpu'


def _sqdist_rows(a_ref, b_ref, ndim, out_rows, out_cols):
    """(out_rows, out_cols) squared distances, accumulated per axis.

    *ndim* is static, so the loop unrolls into ``ndim`` VPU
    broadcast-subtract-square-accumulate passes with static lane picks.
    """
    acc = jnp.zeros((out_rows, out_cols), jnp.float32)
    for k in range(ndim):
        diff = a_ref[:, k][:, None] - b_ref[:, k][None, :]
        acc = acc + diff * diff
    return acc


def _member_kernel(ndim, tpoints_ref, tmask_ref, cand_ref, r2_ref, out_ref):
    """One candidate tile: any(d2 <= r2) against all valid live points."""
    d2 = _sqdist_rows(cand_ref, tpoints_ref, ndim,
                      cand_ref.shape[0], tpoints_ref.shape[0])
    within = jnp.logical_and(d2 <= r2_ref[0], tmask_ref[:][None, :] > 0)
    out_ref[:] = jnp.any(within, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('ndim', 'interpret'))
def _radius_member_call(tpoints, tmask_i32, cands, r2, ndim,
                        interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = cands.shape[0]
    tile = min(TILE_M, m)
    return pl.pallas_call(
        functools.partial(_member_kernel, ndim),
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec(tpoints.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpoints.shape[0],), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cands.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m,), jnp.int32),
        interpret=interpret,
    )(tpoints, tmask_i32, cands, r2)


def radius_member_traced(t_candidates, tpoints, tmask, maxradiussq,
                         interpret=False):
    """Membership test callable inside a jitted computation.

    Accepts the unpadded traced arrays of the fused proposal path;
    returns a bool vector over candidates. Candidate and live counts
    must already be multiples of the TPU tile sizes (the fused path's
    pow-2 bucketing guarantees this).
    """
    m, d = t_candidates.shape
    npts = tpoints.shape[0]
    if npts > MAX_VMEM_POINTS:
        # live set too large for VMEM residency: XLA fallback
        from .pairwise import pairwise_sqdist
        d2 = pairwise_sqdist(tpoints, t_candidates)
        within = jnp.logical_and(d2 <= maxradiussq, tmask[:, None])
        return jnp.any(within, axis=0)
    out = _radius_member_call(
        tpoints.astype(jnp.float32),
        tmask.astype(jnp.int32),
        t_candidates.astype(jnp.float32),
        jnp.asarray(maxradiussq, jnp.float32).reshape(1),
        ndim=int(d), interpret=interpret)
    return out > 0


def radius_member_pallas(tpoints, tmask, candidates, maxradiussq,
                         interpret=False):
    """Within-radius membership of *candidates* against valid *tpoints*.

    Host-facing wrapper (numpy in/out, padding handled here).

    Parameters
    ----------
    tpoints: array (N, d)
        live points in whitened space
    tmask: bool array (N,)
        valid rows of tpoints
    candidates: array (M, d)
        query points in whitened space
    maxradiussq: float
        squared MLFriends radius
    interpret: bool
        run in the Pallas interpreter (for CPU tests)

    Returns
    -------
    member: bool array (M,)
    """
    tpoints = np.asarray(tpoints, np.float32)
    candidates = np.asarray(candidates, np.float32)
    n, d = tpoints.shape
    m = len(candidates)
    npad = round_up(n)
    mpad = round_up(m, 128)

    tp = pad_rows(tpoints, npad)
    tm = pad_rows(np.asarray(tmask, np.int32), npad, 0)
    # push padded candidates far away so they never count as members
    cd = pad_rows(candidates, mpad, fill=1e5)
    out = radius_member_traced(jnp.asarray(cd), jnp.asarray(tp),
                               jnp.asarray(tm), np.float32(maxradiussq),
                               interpret=interpret)
    return np.asarray(out)[:m].astype(bool)


def _bootstrap_kernel(ndim, nrounds, tpoints_ref, valid_ref, masks_ref,
                      out_ref, d2_ref):
    """All bootstrap rounds over a VMEM-resident distance matrix.

    Masks stay in 32-bit arithmetic form throughout: Mosaic only
    supports minor-dim broadcasts of 32-bit types, so boolean
    ``[:, None]`` inserts would fail to lower.
    """
    n = tpoints_ref.shape[0]
    d2_ref[:] = _sqdist_rows(tpoints_ref, tpoints_ref, ndim, n, n)
    big = jnp.float32(1e30)

    def one_round(b, best):
        sel = masks_ref[b, :].astype(jnp.float32)          # (N,) 0/1
        # unselected rows are pushed out of the min by +big
        d2sel = d2_ref[:] + (big - big * sel)[:, None]
        mind = jnp.min(d2sel, axis=0)
        # the max runs over valid, unselected points only
        outside = valid_ref[:].astype(jnp.float32) * (1.0 - sel)
        maxd = jnp.max(mind * outside - big * (1.0 - outside))
        return jnp.maximum(best, maxd)

    out_ref[0, 0] = jax.lax.fori_loop(0, nrounds, one_round,
                                      jnp.float32(0.0))


@functools.partial(jax.jit, static_argnames=('ndim', 'interpret'))
def _bootstrap_radius_call(tpoints, valid_i32, masks_i32, ndim,
                           interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = tpoints.shape[0]
    nrounds = masks_i32.shape[0]
    return pl.pallas_call(
        functools.partial(_bootstrap_kernel, ndim, nrounds),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        interpret=interpret,
    )(tpoints, valid_i32, masks_i32)


def bootstrap_radius_pallas(tpoints, masks, interpret=False):
    """Bootstrapped MLFriends radius with the distance matrix in VMEM.

    Drop-in device alternative to the XLA scan in
    :func:`ultranest_tpu.ops.bootstrap._bootstrap_radius`; the (N, N)
    matrix is computed once into VMEM scratch and every masked min/max
    round reduces over it on-chip. Returns None when the padded live
    set exceeds the VMEM budget (caller falls back to XLA).
    """
    tpoints = np.asarray(tpoints, np.float32)
    n, d = tpoints.shape
    npad = round_up(n)
    if npad > MAX_VMEM_POINTS:
        return None
    tp = pad_rows(tpoints, npad)
    valid = pad_rows(np.ones(n, np.int32), npad, 0)
    mk = np.zeros((len(masks), npad), dtype=np.int32)
    mk[:, :n] = masks
    out = _bootstrap_radius_call(jnp.asarray(tp), jnp.asarray(valid),
                                 jnp.asarray(mk), ndim=int(d),
                                 interpret=interpret)
    return float(np.asarray(out)[0, 0])
