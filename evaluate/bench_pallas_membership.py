"""On-chip shootout: XLA vs Pallas membership kernel variants.

The round-2 verdict asked for one focused optimization round on the
Pallas membership kernel before keeping or retiring it. Variants:

* xla      — the production path (pairwise_sqdist scan + masked any)
* pallas   — the existing kernel (row-major refs, per-axis column picks)
* pallas_t — transposed layout: (d, N)/(d, M) refs so each axis slice is
             a contiguous lane vector (no sublane gathers)

Prints ms per call for each at the fused path's hot shape.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=50):
    fn(*args).block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    out.block_until_ready()
    return (time.time() - t0) / n * 1e3


def make_inputs(npts=512, m=4096, d=16, seed=0):
    rng = np.random.RandomState(seed)
    tp = rng.normal(size=(npts, d)).astype(np.float32)
    cd = rng.normal(size=(m, d)).astype(np.float32)
    tm = np.ones(npts, np.int32)
    r2 = np.float32(4.0 * d)
    return tp, tm, cd, r2


@jax.jit
def xla_member(tp, tm, cd, r2):
    from ultranest_tpu.ops.pairwise import pairwise_sqdist
    d2 = pairwise_sqdist(tp, cd)
    within = jnp.logical_and(d2 <= r2, (tm > 0)[:, None])
    return jnp.any(within, axis=0)


def _member_kernel_t(ndim, tp_t_ref, tm_ref, cd_t_ref, r2_ref, out_ref):
    m = cd_t_ref.shape[1]
    n = tp_t_ref.shape[1]
    acc = jnp.zeros((m, n), jnp.float32)
    for k in range(ndim):
        diff = cd_t_ref[k, :][:, None] - tp_t_ref[k, :][None, :]
        acc = acc + diff * diff
    within = jnp.logical_and(acc <= r2_ref[0], (tm_ref[:] > 0)[None, :])
    out_ref[:] = jnp.any(within, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('ndim',))
def pallas_member_t(tp_t, tm, cd_t, r2, ndim):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    m = cd_t.shape[1]
    tile = min(1024, m)
    return pl.pallas_call(
        functools.partial(_member_kernel_t, ndim),
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec(tp_t.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp_t.shape[1],), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cd_t.shape[0], tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m,), jnp.int32),
    )(tp_t, tm, cd_t, r2)


def main():
    from ultranest_tpu.ops.pallas_kernels import _radius_member_call
    print('backend:', jax.default_backend())
    for (npts, m, d) in [(512, 4096, 16), (512, 32768, 2),
                         (1024, 16384, 8)]:
        tp, tm, cd, r2 = make_inputs(npts, m, d)
        t_x = timeit(xla_member, tp, tm, cd, r2)
        try:
            t_p = timeit(functools.partial(_radius_member_call, ndim=d),
                         tp, tm, cd, np.asarray([r2], np.float32))
        except Exception as e:
            t_p = float('nan')
            print('pallas row-major failed:', str(e)[:200])
        try:
            t_t = timeit(functools.partial(pallas_member_t, ndim=d),
                         np.ascontiguousarray(tp.T), tm,
                         np.ascontiguousarray(cd.T),
                         np.asarray([r2], np.float32))
        except Exception as e:
            t_t = float('nan')
            print('pallas transposed failed:', str(e)[:200])
        print('N=%d M=%d d=%d:  xla %.3f ms   pallas %.3f ms   '
              'pallas_T %.3f ms' % (npts, m, d, t_x, t_p, t_t), flush=True)


if __name__ == '__main__':
    main()
