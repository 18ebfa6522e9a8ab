# noqa: D400 D205
"""
Pallas TPU kernels for the hot region ops
-----------------------------------------

Hand-scheduled alternatives to the XLA-fused kernels in
:mod:`ultranest_tpu.ops.pairwise` for the hottest operation of the
rejection-sampling path: the MLFriends membership test of a large
candidate batch against the live-point set.

The kernel keeps the (padded) live points resident in VMEM and streams
candidate tiles through the MXU: for each candidate tile it computes the
Gram matrix against all live points, forms squared distances, masks
invalid rows and reduces to a per-candidate "within radius of any live
point" flag. One pass, no HBM round-trip for the distance matrix.

Enable in the fused sampler with ``ULTRANEST_TPU_PALLAS=1`` (TPU backend
only); the XLA path remains the default and the fallback.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pairwise import pad_rows, round_up

__all__ = ['radius_member_pallas', 'pallas_available']

TILE_M = 1024   # candidate rows per grid step (matches the
                # XLA s32 1-D tile layout of the output)


def pallas_available():
    """Whether the Pallas TPU lowering path is usable on this backend."""
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except ImportError:
        return False
    return jax.default_backend() == 'tpu'


def _member_kernel(tpoints_ref, tmask_ref, cand_ref, r2_ref, out_ref):
    """One candidate tile: any(d2 <= r2) against all live points."""
    tp = tpoints_ref[:]                  # (Np, D) VMEM-resident
    cand = cand_ref[:]                   # (TILE_M, D)
    ra = jnp.sum(tp * tp, axis=1)        # (Np,)
    rb = jnp.sum(cand * cand, axis=1)    # (TILE_M,)
    g = jax.lax.dot_general(
        cand, tp,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TILE_M, Np)
    d2 = rb[:, None] + ra[None, :] - 2.0 * g
    within = jnp.logical_and(d2 <= r2_ref[0], tmask_ref[:] [None, :] > 0)
    out_ref[:] = jnp.any(within, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('interpret',))
def _radius_member_call(tpoints, tmask_i32, cands, r2, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = cands.shape[0]
    grid = (m // TILE_M,)
    return pl.pallas_call(
        _member_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(tpoints.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpoints.shape[0],), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, cands.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m,), jnp.int32),
        interpret=interpret,
    )(tpoints, tmask_i32, cands, r2)


def radius_member_pallas(tpoints, tmask, candidates, maxradiussq,
                         interpret=False):
    """Within-radius membership of *candidates* against valid *tpoints*.

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
    dpad = round_up(d, 128)
    mpad = round_up(m, TILE_M)

    tp = pad_rows(np.pad(tpoints, ((0, 0), (0, dpad - d))), npad)
    tm = pad_rows(np.asarray(tmask, np.int32), npad, 0)
    # push padded candidates far away so they never count as members
    cd = pad_rows(np.pad(candidates, ((0, 0), (0, dpad - d))), mpad,
                  fill=1e5)
    out = _radius_member_call(tp, tm, cd,
                              np.asarray([maxradiussq], np.float32),
                              interpret=interpret)
    return np.asarray(out)[:m].astype(bool)
