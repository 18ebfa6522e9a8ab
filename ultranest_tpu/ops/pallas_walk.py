# noqa: D400 D205
"""
Pallas TPU megakernels for the speculative-shrink population engine
-------------------------------------------------------------------

The XLA spec engine (:meth:`popfused.FusedPopulationSliceSampler.
_build_spec`) runs its shrink rounds as a ``lax.while_loop`` whose body
compiles to ~25 small device kernels; measured on one v5e chip the body
costs ~330 us/round and **no single op dominates** (removing the
direction-bank gather saves 14%, removing the likelihood makes it
slower) — the round is op-dispatch/HBM-latency bound, the textbook case
for one hand-fused kernel. The segment dispatch additionally runs a
``lax.scan`` of P tiny consume steps with the same per-step overhead.

Two kernels, sharing the walk phase:

* :func:`build_spec_walk_pallas` — the walk alone, a drop-in for the
  inner ``spec_walk`` (classic harvest mode);
* :func:`build_segment_pallas` — walk THEN argmin-replace consumption
  of the harvest into the live set, all in ONE kernel; a drop-in for
  ``run_segment`` (same packed record layout as
  :func:`segmentops.pack_segment`).

Design, per the TPU round-cost measurement:

* all walker state (u, v, brackets, step counters) lives in VMEM for
  the whole walk — zero HBM round-trips between shrink rounds;
* randomness comes from the in-kernel PRNG (`pltpu.prng_random_bits`),
  so the 82 MB per-step direction bank and the 105 MB xi bank of the
  XLA path are never materialized — directions are drawn at renewal
  time, which is distribution-identical (each step's direction is iid);
* live-point gathers (differential-evolution pairs, start points) are
  one-hot matmuls against the (npad, d) live set resident in VMEM —
  the MXU-native form of a gather;
* the user's ``jax_loglike``/``jax_transform`` are traced INTO the
  kernel body; anything jnp-traceable that Mosaic can lower works, and
  the builder falls back to the XLA walk if lowering fails.

The walk semantics mirror the XLA spec engine exactly (same speculative
chain construction, same billing of D rows per active walker per round,
same width statistics); only the RNG stream differs, so results are
statistically — not bitwise — identical to the XLA engine. Parity with
the reference algorithm: `/root/reference/ultranest/popstepsampler.py`
(slice family) and `stepfuncs.pyx::update_vectorised_slice_sampler`.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['build_spec_walk_pallas', 'build_segment_pallas',
           'pallas_walk_enabled']


def pallas_walk_enabled():
    """Whether the fused Pallas walk may be used on this backend.

    Opt-in via ``ULTRANEST_TPU_PALLAS_WALK=1`` until the on-chip
    measurement settles the default (cold Mosaic compiles over the
    remote-compiler tunnel are expensive; see docs/performance.md).
    """
    import os
    env = os.environ.get('ULTRANEST_TPU_PALLAS_WALK', '0')
    if env != '1':
        return False
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except ImportError:
        return False
    return jax.default_backend() not in ('cpu',)


def _unif(shape):
    """Uniform [0, 1) from the in-kernel PRNG (mantissa-fill trick)."""
    from jax.experimental.pallas import tpu as pltpu
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    mant = (bits >> 9) | jnp.uint32(0x3F800000)
    return pltpu.bitcast(mant, jnp.float32) - 1.0


def _convert_likelihood(loglike, transform, P, x_dim):
    """Closure-convert ``loglike(transform(u))`` for in-kernel tracing.

    Pallas kernels may not capture array constants (e.g. a model's
    precomputed sigma vector): they must be explicit inputs. Returns
    ``(eval_fn, consts)`` where ``eval_fn(up, *consts2d)`` accepts the
    constants reshaped to 2-D (VMEM refs are tiled 2-D; 0/1-D constants
    travel as ``(1, size)`` and are restored before the call).
    """
    fn = lambda u: loglike(transform(u))  # noqa: E731
    closed = jax.make_jaxpr(fn)(
        jax.ShapeDtypeStruct((P, x_dim), jnp.float32))
    # hoist ALL jaxpr constants (incl. concrete numpy arrays, which
    # jax.closure_convert leaves baked in) into explicit inputs
    consts = [jnp.asarray(c) for c in closed.consts]
    shapes = [c.shape for c in consts]
    consts2d = [jnp.reshape(c, (1, max(int(np.prod(c.shape)), 1)))
                if c.ndim < 2 else c for c in consts]

    def eval_fn(up, *c2d):
        cs = [jnp.reshape(c, s) if len(s) < 2 else c
              for c, s in zip(c2d, shapes)]
        out = jax.core.eval_jaxpr(closed.jaxpr, cs, up)
        return out[0]

    return eval_fn, consts2d


def _cube_intersection_rows(u, v):
    """Chord [tl, tr] where each row's ray u + t*v stays in the cube."""
    a = jnp.where(v != 0, (0.0 - u) / v, -jnp.inf)
    b = jnp.where(v != 0, (1.0 - u) / v, jnp.inf)
    lo = jnp.minimum(a, b)
    hi = jnp.maximum(a, b)
    return (jnp.max(lo, axis=1, keepdims=True),
            jnp.min(hi, axis=1, keepdims=True))


def _walk_phase(eval_rows, P, x_dim, npad, nsteps, D,
                max_rounds, target_done, live_u, live_Lrow, axes,
                nlive_f, Lmin, scale):
    """The in-kernel walk: returns (uf, Lf, step, done, idx0, stats).

    Operates on VMEM-resident values; caller seeds the PRNG.
    """
    # Mosaic's tpu.iota is integer-only; cast to f32 for the one-hot
    # comparisons against floor()-drawn float indices
    col_nl = jax.lax.broadcasted_iota(
        jnp.int32, (P, npad), 1).astype(jnp.float32)
    col_d = jax.lax.broadcasted_iota(
        jnp.int32, (P, x_dim), 1).astype(jnp.float32)

    def draw_direction():
        # 50/50 mix of differential-evolution pair difference and a
        # region principal axis, exactly as the XLA walk
        i1 = jnp.floor(_unif((P, 1)) * nlive_f)
        i2 = jnp.floor(_unif((P, 1)) * (nlive_f - 1.0))
        i2 = jnp.where(i2 >= i1, i2 + 1.0, i2)
        oh = (col_nl == i1).astype(jnp.float32) \
            - (col_nl == i2).astype(jnp.float32)
        v_de = jnp.dot(oh, live_u, preferred_element_type=jnp.float32)
        jx = jnp.floor(_unif((P, 1)) * x_dim)
        ohx = (col_d == jx).astype(jnp.float32)
        v_ax = jnp.dot(ohx, axes, preferred_element_type=jnp.float32)
        pick = _unif((P, 1)) < 0.5
        return jnp.where(pick, v_de, v_ax) * scale

    idx0 = jnp.floor(_unif((P, 1)) * nlive_f)
    oh0 = (col_nl == idx0).astype(jnp.float32)
    u0 = jnp.dot(oh0, live_u, preferred_element_type=jnp.float32)
    L0 = jnp.dot(oh0, live_Lrow, preferred_element_type=jnp.float32)
    v0 = draw_direction()
    tl0, tr0 = _cube_intersection_rows(u0, v0)

    def cond(state):
        it, done = state[7], state[6]
        return jnp.logical_and(
            it < max_rounds, jnp.sum(done) < jnp.float32(target_done))

    def body(state):
        (u, L, v, tl, tr, step, done, it, ncr, widths, nw) = state
        # billing: D speculative rows per still-active walker,
        # identical to the XLA walk
        ncr = ncr + D * (jnp.float32(P) - jnp.sum(done))
        tlc, trc = tl, tr
        taken = jnp.zeros((P, 1), jnp.bool_)
        tstar = jnp.zeros((P, 1), jnp.float32)
        Lstar = jnp.zeros((P, 1), jnp.float32)
        for _ in range(D):
            # candidate drawn as if all earlier ones were rejected:
            # the accepted prefix is exactly the sequential chain
            xi = _unif((P, 1))
            t = tlc + xi * (trc - tlc)
            up = u + t * v
            Lp = eval_rows(up).reshape(P, 1)
            hit = Lp > Lmin
            first = jnp.logical_and(hit, jnp.logical_not(taken))
            tstar = jnp.where(first, t, tstar)
            Lstar = jnp.where(first, Lp, Lstar)
            taken = jnp.logical_or(taken, hit)
            tlc = jnp.where(t < 0, t, tlc)
            trc = jnp.where(t >= 0, t, trc)
        anyhit = jnp.logical_and(taken, done < 0.5)
        u = jnp.where(anyhit, u + tstar * v, u)
        L = jnp.where(anyhit, Lstar, L)
        step = step + anyhit.astype(jnp.float32)
        newly_done = jnp.logical_and(anyhit, step >= jnp.float32(nsteps))
        widths = widths + jnp.sum(jnp.where(anyhit, tr - tl, 0.0))
        nw = nw + jnp.sum(anyhit.astype(jnp.float32))
        done = jnp.maximum(done, newly_done.astype(jnp.float32))

        rej = jnp.logical_and(jnp.logical_not(anyhit), done < 0.5)
        tl = jnp.where(rej, tlc, tl)
        tr = jnp.where(rej, trc, tr)

        renew = jnp.logical_and(anyhit, done < 0.5)
        vn = draw_direction()
        v = jnp.where(renew, vn, v)
        tln, trn = _cube_intersection_rows(u, v)
        tl = jnp.where(renew, tln, tl)
        tr = jnp.where(renew, trn, tr)
        return (u, L, v, tl, tr, step, done, it + 1, ncr, widths, nw)

    init = (u0, L0, v0, tl0, tr0,
            jnp.zeros((P, 1), jnp.float32),
            jnp.zeros((P, 1), jnp.float32),
            jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(0.0))
    (uf, Lf, _v, _tl, _tr, step, done, it, ncr, widths, nw) = \
        jax.lax.while_loop(cond, body, init)
    width = widths / jnp.maximum(nw, 1.0)
    return uf, Lf, step, done, idx0, u0, ncr, width, it


def _seed_scalars(key):
    """Two int32 seed words from a typed key or raw uint32 key data."""
    try:
        kd = jax.random.key_data(key)
    except TypeError:
        kd = key
    kd = jnp.asarray(kd).astype(jnp.uint32).ravel()
    # mask to 31 bits: uint32 -> int32 conversion of out-of-range
    # values is implementation-defined in XLA
    return (jnp.stack([kd[0], kd[-1]])
            & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)


def _scalar_specs(pl, pltpu, n):
    return [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(n)]


def _vmem_specs(pl, pltpu, n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


def build_spec_walk_pallas(loglike, transform, P, x_dim, npad, nsteps,
                           spec_depth, max_rounds, target_done):
    """Build the fused walk with the XLA spec-walk calling convention.

    Returns ``walk(key, live_u, live_L, nlive, axes, Lmin, scale) ->
    (uf, Lf, done, idx0, nc, width)`` — a drop-in for the inner
    ``spec_walk`` of :meth:`popfused.FusedPopulationSliceSampler.
    _build_spec`. Raises at trace/lower time if the likelihood cannot
    lower to Mosaic; callers catch and fall back to the XLA walk.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    eval_fn, consts2d = _convert_likelihood(loglike, transform, P, x_dim)
    ncst = len(consts2d)

    def kernel(seed_ref, nlive_ref, lmin_ref, scale_ref,
               live_u_ref, live_L_ref, axes_ref, *rest):
        const_refs = rest[:ncst]
        uf_ref, lf_ref, sf_ref, stats_ref = rest[ncst:]
        cvals = [r[:] for r in const_refs]
        eval_rows = lambda up: eval_fn(up, *cvals)  # noqa: E731
        pltpu.prng_seed(seed_ref[0], seed_ref[1])
        # padded live_L rows are +/-inf; 0 * inf = NaN in the one-hot
        # matmul, so clamp to the f32 range (padded rows are never
        # selected, the value only has to be finite)
        live_Lrow = jnp.clip(live_L_ref[:], -3e38, 3e38)
        uf, Lf, step, done, idx0, _u0, ncr, width, it = _walk_phase(
            eval_rows, P, x_dim, npad, nsteps, spec_depth,
            max_rounds, target_done, live_u_ref[:], live_Lrow,
            axes_ref[:], nlive_ref[0].astype(jnp.float32),
            lmin_ref[0], scale_ref[0])
        uf_ref[:] = uf
        lf_ref[:] = Lf
        sf_ref[:] = jnp.concatenate([step, done, idx0], axis=1)
        # Mosaic cannot store scalars to VMEM: write the stats row as
        # one masked full-block store instead of per-element assignments
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        stats_ref[:] = jnp.where(
            cols == 0, ncr, jnp.where(
                cols == 1, width, jnp.where(
                    cols == 2, it.astype(jnp.float32), 0.0)))

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((P, x_dim), jnp.float32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
            jax.ShapeDtypeStruct((P, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ),
        in_specs=_scalar_specs(pl, pltpu, 4)
        + _vmem_specs(pl, pltpu, 3 + ncst),
        out_specs=tuple(_vmem_specs(pl, pltpu, 4)),
        # walker state at P=4096, d=50 needs ~21 MB of scoped VMEM;
        # the default limit is 16 MB, the chip has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def walk(key, live_u, live_L, nlive, axes, Lmin, scale):
        seed = _seed_scalars(key)
        uf, lf, sf, stats = call(
            seed, jnp.asarray(nlive, jnp.int32).reshape(1),
            jnp.asarray(Lmin, jnp.float32).reshape(1),
            jnp.asarray(scale, jnp.float32).reshape(1),
            jnp.asarray(live_u, jnp.float32),
            jnp.asarray(live_L, jnp.float32).reshape(npad, 1),
            jnp.asarray(axes, jnp.float32), *consts2d)
        done = sf[:, 1] > 0.5
        idx0 = sf[:, 2].astype(jnp.int32)
        return uf, lf[:, 0], done, idx0, stats[0, 0], stats[0, 1]

    return walk


def build_segment_pallas(loglike, transform, P, x_dim, npad, nsteps,
                         spec_depth, max_rounds, target_done):
    """Walk + on-device live-set consumption in ONE kernel.

    Returns ``run(key, live_u, live_L, nlive, axes, scale, tpack) ->
    (live_u2, live_L2, packed)`` — a drop-in for the XLA
    ``run_segment`` of :meth:`popfused.FusedPopulationSliceSampler.
    _build_spec`; *packed* has the :func:`segmentops.pack_segment`
    layout ``[u, L, accept, worst, Lmin, rank, flags, jump2]`` +
    scalar row. The kernel emits the chain-start coordinates into VMEM
    scratch columns; the wrapper reduces them to the single whitened
    jump-distance column (:func:`segmentops.whitened_jump2`) before
    anything leaves the device.

    The consume phase replays the XLA ``segmentops.consume_scan``
    semantics row by row in a ``fori_loop`` over VMEM state — the XLA
    version is a P-step ``lax.scan`` whose per-step dispatch overhead
    this kernel eliminates.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # u, L + RECORD_COLS + chain-start coordinates (jump diagnostics)
    ncols = x_dim + 6 + x_dim
    eval_fn, consts2d = _convert_likelihood(loglike, transform, P, x_dim)
    ncst = len(consts2d)

    def kernel(seed_ref, nlive_ref, scale_ref,
               live_u_ref, live_L_ref, axes_ref, *rest):
        const_refs = rest[:ncst]
        lu2_ref, ll2_ref, packed_ref = rest[ncst:]
        cvals = [r[:] for r in const_refs]
        eval_rows = lambda up: eval_fn(up, *cvals)  # noqa: E731
        pltpu.prng_seed(seed_ref[0], seed_ref[1])
        live_L = live_L_ref[:]                       # (npad, 1), +inf pad
        Lmin0 = jnp.min(live_L)
        live_Lrow = jnp.clip(live_L, -3e38, 3e38)
        uf, Lf, step, done, idx0, u0, ncr, width, it = _walk_phase(
            eval_rows, P, x_dim, npad, nsteps, spec_depth,
            max_rounds, target_done, live_u_ref[:], live_Lrow,
            axes_ref[:], nlive_ref[0].astype(jnp.float32),
            Lmin0, scale_ref[0])

        # ---- consume phase (segmentops.consume_scan semantics) ----
        # Mosaic has no scalar VMEM access, so the sequential pass
        # carries VALUES and uses masked full-array ops throughout:
        # only the (npad, 1) live-L vector and the (P, 5) record block
        # are touched per iteration; coordinates are reconstructed
        # afterwards in one one-hot-matmul scatter pass, exactly like
        # the XLA consume_scan's scatter-max epilogue.
        rowidx = jax.lax.broadcasted_iota(
            jnp.int32, (P, 1), 0).astype(jnp.float32)
        slotidx = jax.lax.broadcasted_iota(
            jnp.int32, (npad, 1), 0).astype(jnp.float32)
        reccol = jax.lax.broadcasted_iota(jnp.int32, (P, 5), 1)

        def consume(i, carry):
            lL, rec = carry                          # (npad,1), (P,5)
            fi = jnp.asarray(i).astype(jnp.float32)
            rowmask = rowidx == fi                   # (P, 1)
            L_i = jnp.sum(jnp.where(rowmask, Lf, 0.0))
            valid_i = jnp.sum(jnp.where(rowmask, done, 0.0))
            Lmin_i = jnp.min(lL)
            # first-min slot, arithmetically (jnp.argmin semantics)
            wcand = jnp.where(lL == Lmin_i, slotidx, jnp.float32(npad))
            worst = jnp.min(wcand)
            wfirst = slotidx == worst                # (npad, 1)
            accept = jnp.logical_and(valid_i > 0.5, L_i > Lmin_i)
            rank = jnp.sum((lL < L_i).astype(jnp.float32))
            plateau = jnp.sum((lL == Lmin_i).astype(jnp.float32)) > 1.0
            dup = jnp.any(lL == L_i)
            flags = jnp.where(plateau, 2.0, 0.0) \
                + jnp.where(dup, 1.0, 0.0)
            newrow = jnp.where(
                reccol == 0, jnp.where(accept, 1.0, 0.0), jnp.where(
                    reccol == 1, worst, jnp.where(
                        reccol == 2, Lmin_i, jnp.where(
                            reccol == 3, rank, flags))))
            rec = jnp.where(rowmask, newrow, rec)
            lL = jnp.where(jnp.logical_and(wfirst, accept), L_i, lL)
            return lL, rec

        lL2, rec = jax.lax.fori_loop(
            0, P, consume, (live_L, jnp.zeros((P, 5), jnp.float32)))
        ll2_ref[:] = lL2

        # scatter-max epilogue: each slot's final occupant is the LAST
        # accepted row that replaced it; one-hot matmul gather of uf
        acc = rec[:, 0:1] > 0.5                      # (P, 1)
        tgt = jnp.where(acc, rec[:, 1:2], jnp.float32(npad))
        hitm = tgt.T == slotidx                      # (npad, P)
        last_row = jnp.max(
            jnp.where(hitm, rowidx.T, -1.0), axis=1, keepdims=True)
        sel = jnp.where(
            last_row >= 0, (rowidx.T == last_row).astype(jnp.float32),
            0.0)                                     # (npad, P)
        gath = jnp.dot(sel, uf, preferred_element_type=jnp.float32)
        lu2_ref[:] = jnp.where(last_row >= 0, gath, live_u_ref[:])

        scol = jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1)
        scalars = jnp.where(
            scol == 0, ncr, jnp.where(
                scol == 1, jnp.mean(done), jnp.where(
                    scol == 2, width, 0.0)))
        packed_ref[:] = jnp.concatenate(
            [jnp.concatenate([uf, Lf, rec, u0], axis=1), scalars],
            axis=0)

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((npad, x_dim), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            jax.ShapeDtypeStruct((P + 1, ncols), jnp.float32),
        ),
        in_specs=_scalar_specs(pl, pltpu, 3)
        + _vmem_specs(pl, pltpu, 3 + ncst),
        out_specs=tuple(_vmem_specs(pl, pltpu, 3)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def run_segment(key, live_u, live_L, nlive, axes, scale, tpack):
        from ..segmentops import whitened_jump2
        seed = _seed_scalars(key)
        lu2, ll2, packed = call(
            seed, jnp.asarray(nlive, jnp.int32).reshape(1),
            jnp.asarray(scale, jnp.float32).reshape(1),
            jnp.asarray(live_u, jnp.float32),
            jnp.asarray(live_L, jnp.float32).reshape(npad, 1),
            jnp.asarray(axes, jnp.float32), *consts2d)
        # reduce the chain-start block to the one whitened jump column
        # before the array leaves the device (host payload halves)
        jump2 = whitened_jump2(packed[:P, x_dim + 6:], packed[:P, :x_dim],
                               jnp.asarray(tpack, jnp.float32))
        jcol = jnp.zeros((P + 1, 1), jnp.float32).at[:P, 0].set(jump2)
        packed = jnp.concatenate([packed[:, :x_dim + 6], jcol], axis=1)
        return lu2, ll2[:, 0], packed

    return run_segment
