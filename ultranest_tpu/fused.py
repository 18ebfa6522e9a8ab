# noqa: D400 D205
"""
Fused device proposal path
--------------------------

For JAX-traceable likelihood/transform pairs, one jitted device call
performs the entire hot loop of a nested sampling iteration batch:

    draw candidates -> whiten -> region membership (Gram matmul against the
    live points) -> unit-cube test -> p-space ellipsoid test -> transform
    -> log-likelihood -> threshold acceptance

This replaces the reference's per-candidate host loop
(`/root/reference/ultranest/integrator.py:1773-1837`) with a single
device dispatch per refill; the host only compacts the accepted rows and
does tree bookkeeping. Region geometry is passed as plain arrays each call
(a few KB piggybacked on the dispatch), so live-point updates between
region rebuilds need no extra device traffic.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from .ops.pairwise import pad_rows, pairwise_sqdist, round_up

__all__ = ['FusedRegionSampler']

# proposal method codes (traced, so switching costs no recompile)
METHOD_CUBE = 0         # uniform in the unit cube, filtered
METHOD_ELLIPSOID = 1    # uniform in the enlarged wrapping ellipsoid
METHOD_TBOX = 2         # uniform in the whitened-space bounding box
METHOD_POINTS = 3       # balls around live points, multiplicity-corrected

# method rotation order on starvation: global proposals first, then the
# live-point balls (which track tight multimodal tails best)
METHOD_CYCLE = [METHOD_ELLIPSOID, METHOD_POINTS, METHOD_CUBE, METHOD_TBOX]

# cap on accepted candidates returned per proposal call; generous —
# truncated rows are paid-for likelihood evaluations thrown away, while
# extra transfer rows cost little (the row width is a few floats)
MAX_RETURN = 1024


def _inside_ellipsoid(u, ctr, invcov, enlarge):
    d = u - ctr
    m = jnp.einsum('ij,jk,ik->i', d, invcov, d,
                   precision=jax.lax.Precision.HIGHEST)
    return m <= enlarge


# Pallas membership kernel (opt-in with ULTRANEST_TPU_PALLAS=1): keeps
# the live points VMEM-resident and streams candidate tiles. Measured on
# one v5e chip it LOSES to the XLA path (0.95 vs 0.73 ms at
# N=512/M=4096/d=16) and Mosaic compiles cost minutes per shape bucket,
# so XLA is the default — see docs/performance.md.
USE_PALLAS = os.environ.get('ULTRANEST_TPU_PALLAS', '0') == '1'


def _radius_member(t_candidates, tpoints, tmask, maxradiussq):
    """Within MLFriends radius of any valid live point.

    Distances accumulate per axis by direct differences (see
    :func:`ultranest_tpu.ops.pairwise.pairwise_sqdist` for why the Gram
    identity is numerically unusable here). On the TPU backend the
    Pallas kernel (:mod:`ultranest_tpu.ops.pallas_kernels`) serves this
    from VMEM.
    """
    if USE_PALLAS and jax.default_backend() == 'tpu':
        from .ops.pallas_kernels import radius_member_traced
        return radius_member_traced(t_candidates, tpoints, tmask,
                                    maxradiussq)
    d2 = pairwise_sqdist(tpoints, t_candidates)
    within = jnp.logical_and(d2 <= maxradiussq, tmask[:, None])
    return jnp.any(within, axis=0)


class FusedRegionSampler:
    """Device-fused candidate proposal for JAX-native models.

    Parameters
    ----------
    loglike: jax function
        (n, num_params) -> (n,) log-likelihood, jax-traceable
    transform: jax function or None
        (n, x_dim) -> (n, num_params) prior transform, jax-traceable
    x_dim: int
        dimensionality
    seed: int
        device RNG seed
    """

    def __init__(self, loglike, transform, x_dim, seed=0, mesh=None,
                 axis_name='ranks'):
        self.loglike = loglike
        self.transform = transform if transform is not None else (lambda u: u)
        self.x_dim = x_dim
        self.key = jax.random.PRNGKey(seed)
        self.mesh = mesh
        self.axis_name = axis_name
        self.nshards = 1 if mesh is None else int(mesh.devices.size)
        self._propose_cache = {}
        self._pending = None

    def _get_propose(self, ndraw, kind, has_tregion):
        cache_key = (ndraw, kind, has_tregion)
        fn = self._propose_cache.get(cache_key)
        if fn is None:
            fn = self._build(ndraw, kind, has_tregion)
            self._propose_cache[cache_key] = fn
        return fn

    def _build(self, ndraw, kind, has_tregion, segment=False):
        loglike = self.loglike
        transform = self.transform
        x_dim = self.x_dim
        nshards = self.nshards
        axis_name = self.axis_name
        ndraw_local = max(128, ndraw // nshards)
        kreturn = max(16, MAX_RETURN // nshards)

        def body(key, tpoints, tmask, nlive, T, invT, ctr, maxradiussq,
                    ell_ctr, ell_invcov, enlarge, ell_axes_T,
                    treg_ctr, treg_invcov, treg_enlarge, tbox_lo, tbox_hi,
                    Lmin, method, naccept_budget):
            kdraw, kdir, krad, kidx, kmult = jax.random.split(key, 5)
            ones = jnp.ones(ndraw_local, bool)

            def ball_offsets(scale):
                z = jax.random.normal(kdir, (ndraw_local, x_dim), jnp.float32)
                z = z / jnp.linalg.norm(z, axis=1, keepdims=True)
                r = jax.random.uniform(krad, (ndraw_local, 1),
                                       jnp.float32) ** (1.0 / x_dim)
                return z * r * scale

            def draw_cube(_):
                return jax.random.uniform(kdraw, (ndraw_local, x_dim),
                                          jnp.float32), ones

            def draw_ellipsoid(_):
                offs = ball_offsets(jnp.sqrt(enlarge))
                return ell_ctr[None, :] + jnp.dot(
                    offs, ell_axes_T,
                    preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST), ones

            def draw_tbox(_):
                v = jax.random.uniform(kdraw, (ndraw_local, x_dim), jnp.float32)
                v = tbox_lo[None, :] + v * (tbox_hi - tbox_lo)[None, :]
                return jnp.dot(v, invT,
                               preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST) \
                    + ctr[None, :], ones

            def draw_points(_):
                # balls around random live points in whitened space, with
                # 1/multiplicity acceptance (cf. sample_from_points,
                # mlfriends.pyx:1072-1094)
                idx = jax.random.randint(kidx, (ndraw_local,), 0, nlive)
                centers = tpoints[idx]
                t_prop = centers + ball_offsets(jnp.sqrt(maxradiussq))
                d2 = pairwise_sqdist(tpoints, t_prop)
                within = jnp.logical_and(d2 <= maxradiussq, tmask[:, None])
                counts = jnp.sum(within, axis=0)
                mult_ok = jax.random.uniform(kmult, (ndraw_local,)) \
                    * jnp.maximum(counts, 1) < 1
                mult_ok = jnp.logical_and(mult_ok, counts >= 1)
                u = jnp.dot(t_prop, invT,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST) \
                    + ctr[None, :]
                return u, mult_ok

            branches = [draw_cube, draw_ellipsoid, draw_tbox]
            if kind == 'mlfriends':
                branches.append(draw_points)
            u, mult_ok = jax.lax.switch(method, branches, None)

            in_cube = jnp.logical_and(u > 0, u < 1).all(axis=1)
            member = jnp.logical_and(
                in_cube, _inside_ellipsoid(u, ell_ctr, ell_invcov, enlarge))
            member = jnp.logical_and(member, mult_ok)
            if kind == 'mlfriends':
                t = jnp.dot(u - ctr[None, :], T,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                member = jnp.logical_and(
                    member, _radius_member(t, tpoints, tmask, maxradiussq))

            v = transform(u)
            if has_tregion:
                member = jnp.logical_and(
                    member,
                    _inside_ellipsoid(v, treg_ctr, treg_invcov, treg_enlarge))
            logl = jnp.where(member, loglike(v), -jnp.inf)
            if segment:
                # segment mode: billing stops at the acceptance budget,
                # and only rows that can possibly be consumed (above the
                # dispatch threshold, within budget) enter the consume
                # scan — compacted to a fixed window so the sequential
                # scan length is ~budget, not ~ndraw
                scan_cap = min(MAX_RETURN, ndraw_local)
                accepted0 = jnp.logical_and(member, logl > Lmin)
                budget = jnp.minimum(naccept_budget, scan_cap)
                wb = jnp.cumsum(accepted0.astype(jnp.int32)) <= budget
                member_b = jnp.logical_and(member, wb)
                valid = jnp.logical_and(accepted0, wb)
                order = jnp.argsort(jnp.logical_not(valid),
                                    stable=True)[:scan_cap]
                return u[order], logl[order], \
                    valid[order].astype(jnp.float32), jnp.sum(member_b)
            accepted = jnp.logical_and(member, logl > Lmin)
            # acceptance budget: processing stops at the budget-th
            # accepted row in draw order, exactly as a sequential sampler
            # that quits once it has enough would — later rows are
            # neither returned nor billed to ncall. Without this, an
            # early high-acceptance batch pays thousands of evaluations
            # for a handful of consumed points.
            budget = jnp.minimum(naccept_budget, kreturn)
            within_budget = jnp.cumsum(accepted.astype(jnp.int32)) <= budget
            member = jnp.logical_and(member, within_budget)
            accepted = jnp.logical_and(accepted, within_budget)
            nc = jnp.sum(member)
            # compact on device: accepted candidates first, preserving draw
            # order (stable sort), truncated to kreturn rows — keeps the
            # device->host transfer tiny regardless of ndraw
            order = jnp.argsort(jnp.logical_not(accepted), stable=True)
            sel = order[:min(kreturn, ndraw_local)]
            n_accepted = jnp.minimum(jnp.sum(accepted), len(sel))
            return u[sel], v[sel], logl[sel], n_accepted, nc

        def pack(u, v, logl, n_acc, nc):
            # single f32 result array: each array in a fetched tuple costs
            # its own host<->device round trip on remote backends.
            # layout: k data rows [u | v | logl], then scalar rows holding
            # [nc, n_acc...] padded to the row width (f32-exact to 2**24).
            rows = jnp.concatenate(
                [u, v, logl[:, None].astype(jnp.float32)], axis=1)
            width = rows.shape[1]
            s = jnp.concatenate([
                jnp.ravel(nc).astype(jnp.float32),
                jnp.ravel(n_acc).astype(jnp.float32)])
            nsrows = -(-(s.shape[0]) // width)
            s = jnp.pad(s, (0, nsrows * width - s.shape[0]))
            return jnp.concatenate([rows, s.reshape(nsrows, width)], axis=0)

        if segment:
            from .segmentops import consume_scan, pack_segment
            x_dim_ = x_dim

            @jax.jit
            def run_segment(key, live_u, live_L, nlive, T, invT, ctr,
                            maxradiussq, ell_ctr, ell_invcov, enlarge,
                            ell_axes_T, tbox_lo, tbox_hi, method,
                            naccept_budget):
                Lmin0 = jnp.min(live_L)          # padding is +inf
                tmask = jnp.arange(live_L.shape[0]) < nlive
                tpoints = jnp.dot(
                    jnp.where(tmask[:, None], live_u, 0.0)
                    - ctr[None, :], T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                dummy = jnp.zeros(x_dim_, jnp.float32)
                u, logl, valid, nc = body(
                    key, tpoints, tmask, nlive, T, invT, ctr,
                    maxradiussq, ell_ctr, ell_invcov, enlarge,
                    ell_axes_T, dummy, jnp.eye(x_dim_, dtype=jnp.float32),
                    jnp.float32(1.0), tbox_lo, tbox_hi, Lmin0, method,
                    naccept_budget)
                live_u2, live_L2, recs = consume_scan(
                    live_u, live_L, u, logl, valid)
                packed = pack_segment(
                    u, logl, recs, nc.astype(jnp.float32),
                    jnp.mean(valid), jnp.float32(0.0))
                return live_u2, live_L2, packed

            return run_segment

        if nshards == 1:
            return jax.jit(lambda *args: pack(*body(*args)))

        from jax.sharding import PartitionSpec as P

        def shard_fn(keys, *args):
            # per-shard deterministic RNG (the fold_in pattern replacing
            # the reference's rank-hashed seeds, integrator.py:1239-1251)
            key = jax.random.fold_in(keys[0],
                                     jax.lax.axis_index(axis_name))
            u, v, logl, n_acc, nc = body(key, *args)
            u_all = jax.lax.all_gather(u, axis_name, tiled=True)
            v_all = jax.lax.all_gather(v, axis_name, tiled=True)
            logl_all = jax.lax.all_gather(logl, axis_name, tiled=True)
            n_acc_all = jax.lax.all_gather(n_acc[None], axis_name,
                                           tiled=True)
            nc_tot = jax.lax.psum(nc, axis_name)
            return u_all, v_all, logl_all, n_acc_all, nc_tot

        nargs = 19
        mapped = jax.shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(axis_name),) + (P(),) * nargs,
            out_specs=(P(), P(), P(), P(), P()), check_vma=False)
        return jax.jit(lambda *args: pack(*mapped(*args)))

    # --- segment mode -------------------------------------------------
    # Driven by integrator._explore_segments: the live set chains on the
    # device and each dispatch draws a candidate batch AND consumes it
    # (see segmentops.consume_scan). The whitened live points for the
    # MLFriends membership test are recomputed from the device live set
    # every dispatch — fresher than the classic path's host-shipped
    # copies.

    segment_capable = True

    def segment_ok(self):
        """Whether segment mode should drive this sampler.

        Off by default: measured on the eggbox benchmark the classic
        budgeted path wins (4.2 s vs 7.2 s on one TPU chip) — rejection
        candidate batches leave the host so little replay work that the
        consume scan + transfer become the critical path. Opt in with
        ``sampler.fused_sampler.segment_enabled = True`` or
        ``ULTRANEST_TPU_SEGMENT_REJECTION=1`` (profitable when host
        bookkeeping, not the device, limits throughput).
        """
        enabled = getattr(self, 'segment_enabled', None)
        if enabled is None:
            enabled = os.environ.get(
                'ULTRANEST_TPU_SEGMENT_REJECTION', '0') == '1'
        return enabled and self.nshards == 1

    def segment_start(self, us, Ls, ndraw=4096):
        """Upload live state and prepare the segment kernel cache."""
        from .ops.pairwise import pad_rows, round_up
        nlive, d = us.shape
        assert d == self.x_dim
        self._seg_nlive = nlive
        self._seg_npad = round_up(nlive)
        self._seg_ndraw = round_up(max(int(ndraw), 512), 128)
        lu = pad_rows(np.asarray(us, np.float32), self._seg_npad)
        lL = pad_rows(np.asarray(Ls, np.float32), self._seg_npad,
                      fill=np.inf)
        self._seg_state = (jax.device_put(lu), jax.device_put(lL))
        self._seg_queue = []
        self._seg_method_i = 0
        self._seg_last_nc = None
        self._pending = None      # classic prefetch superseded

    def _get_segment_kernel(self, kind):
        ck = ('seg', self._seg_npad, self._seg_ndraw, kind)
        fn = self._propose_cache.get(ck)
        if fn is None:
            fn = self._build(self._seg_ndraw, kind, False, segment=True)
            self._propose_cache[ck] = fn
        return fn

    def segment_launch(self, region):
        """Dispatch one chained draw+consume segment (non-blocking)."""
        layer = region.transformLayer
        x_dim = self.x_dim
        kind = 'mlfriends' if type(region).__name__ == 'MLFriends' \
            else 'ellipsoid'
        if hasattr(layer, 'T') and np.ndim(layer.T) == 2:
            T = np.asarray(layer.T, np.float32)
            invT = np.asarray(layer.invT, np.float32)
            ctr = np.asarray(layer.ctr, np.float32)
        else:
            std = np.ravel(np.broadcast_to(layer.std, (1, x_dim)))
            mean = np.ravel(np.broadcast_to(layer.mean, (1, x_dim)))
            T = np.diag(1.0 / std).astype(np.float32)
            invT = np.diag(std).astype(np.float32)
            ctr = mean.astype(np.float32)
        maxr = region.maxradiussq if region.maxradiussq is not None else 0.0
        sq = np.float32(maxr) ** 0.5
        tbox_lo = np.asarray(region.bbox_lo, np.float32) - sq
        tbox_hi = np.asarray(region.bbox_hi, np.float32) + sq
        method = METHOD_CYCLE[self._seg_method_i % len(METHOD_CYCLE)]
        if kind != 'mlfriends' and method == METHOD_POINTS:
            method = METHOD_ELLIPSOID
        kernel = self._get_segment_kernel(kind)
        self.key, sub = jax.random.split(self.key)
        lu, lL, packed = kernel(
            sub, self._seg_state[0], self._seg_state[1],
            np.int32(self._seg_nlive), T, invT, ctr, np.float32(maxr),
            np.asarray(region.ellipsoid_center, np.float32),
            np.asarray(region.ellipsoid_invcov, np.float32),
            np.float32(region.enlarge),
            np.asarray(region.ellipsoid_axes_T, np.float32),
            tbox_lo, tbox_hi, np.int32(method),
            np.int32(max(64, self._seg_nlive // 2)))
        self._seg_state = (lu, lL)
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
        self._seg_queue.append(packed)

    def segment_fetch(self):
        """Block on the oldest queued segment; returns parsed records."""
        packed = np.asarray(jax.device_get(self._seg_queue.pop(0)), float)
        d = self.x_dim
        rows, scal = packed[:-1], packed[-1]
        flags = rows[:, d + 5]
        nc = int(scal[0])
        if nc < max(1, self._seg_ndraw // 200):
            # proposal strategy starved: rotate to the next method
            self._seg_method_i += 1
        return dict(
            u=rows[:, :d], L=rows[:, d],
            accept=rows[:, d + 1] > 0.5,
            worst=rows[:, d + 2].astype(np.int64),
            Lmin=rows[:, d + 3],
            rank=rows[:, d + 4].astype(np.int64),
            plateau=flags >= 2, dup=(flags % 2) >= 1,
            nc=nc, done_frac=float(scal[1]), width=float(scal[2]))

    def segment_pending(self):
        """Number of dispatches in flight."""
        q = getattr(self, '_seg_queue', None)
        return len(q) if q else 0

    def segment_stop(self):
        """Leave segment mode, dropping device state and queued work."""
        self._seg_state = None
        self._seg_queue = None

    def __call__(self, region, Lmin, ndraw, tregion=None, method=None,
                 naccept_budget=None):
        """Propose *ndraw* candidates; returns (u, v, logl, nc) compacted.

        *region* is an MLFriends-family region (host object); its geometry
        is shipped as arrays with the call. *method* picks the proposal
        strategy (default: wrapping ellipsoid).

        If a prefetched dispatch is in flight (see :meth:`prefetch`), its
        result is consumed instead of paying a fresh synchronous
        dispatch.
        """
        if self._pending is not None:
            out, num_params, ndrawn = self._pending
            self._pending = None
            return self._unpack(out, num_params, ndrawn)
        out, num_params, ndrawn = self._launch(region, Lmin, ndraw,
                                               tregion, method,
                                               naccept_budget)
        return self._unpack(out, num_params, ndrawn)

    def prefetch(self, region, Lmin, ndraw, tregion=None, method=None,
                 naccept_budget=None):
        """Launch the next proposal batch asynchronously.

        The device computes (and streams the result to the host) while
        the caller keeps consuming its current candidate buffer; the next
        ``__call__`` harvests it. At most one dispatch is in flight.
        No-op on the cpu backend: there is no second processor to
        overlap with, and early launches only add threshold staleness.
        """
        if jax.default_backend() == 'cpu':
            return
        if self._pending is None:
            self._pending = self._launch(region, Lmin, ndraw, tregion,
                                         method, naccept_budget)

    def _unpack(self, out, num_params, ndraw):
        x_dim = self.x_dim
        # ONE device->host transfer for the whole packed result: on remote
        # TPU backends each fetched array pays full round-trip latency
        packed = np.asarray(jax.device_get(out), dtype=float)
        width = x_dim + num_params + 1
        nscalars = 1 + (self.nshards if self.nshards > 1 else 1)
        nsrows = -(-nscalars // width)
        rows, flat = packed[:-nsrows], packed[-nsrows:].ravel()
        u = rows[:, :x_dim]
        v = rows[:, x_dim:x_dim + num_params]
        logl = rows[:, -1]
        nc = int(flat[0])
        n_accepted = flat[1:1 + (self.nshards if self.nshards > 1 else 1)]

        if self.nshards > 1:
            # per-shard blocks of kreturn rows; keep each shard's accepted
            kreturn = len(u) // self.nshards
            keep = np.zeros(len(u), dtype=bool)
            for s in range(self.nshards):
                keep[s * kreturn:s * kreturn + int(n_accepted[s])] = True
            u, v, logl = u[keep], v[keep], logl[keep]
        else:
            k = min(int(n_accepted[0]), len(u))
            u, v, logl = u[:k], v[:k], logl[:k]
        # guard against f32 rounding to the cube boundary
        np.clip(u, 1e-7, 1 - 1e-7, out=u)
        return u, v, logl, int(nc), ndraw

    def _launch(self, region, Lmin, ndraw, tregion=None, method=None,
                naccept_budget=None):
        ndraw = round_up(ndraw, 128)
        layer = region.transformLayer
        x_dim = self.x_dim
        kind = 'mlfriends' if type(region).__name__ == 'MLFriends' else 'ellipsoid'
        has_tregion = tregion is not None

        # express the layer as an affine map (ScalingLayer is diagonal)
        if hasattr(layer, 'T') and np.ndim(layer.T) == 2:
            T = np.asarray(layer.T, np.float32)
            invT = np.asarray(layer.invT, np.float32)
            ctr = np.asarray(layer.ctr, np.float32)
        else:
            std = np.ravel(np.broadcast_to(layer.std, (1, x_dim)))
            mean = np.ravel(np.broadcast_to(layer.mean, (1, x_dim)))
            T = np.diag(1.0 / std).astype(np.float32)
            invT = np.diag(std).astype(np.float32)
            ctr = mean.astype(np.float32)

        npts = len(region.unormed)
        npad = round_up(npts)
        tpoints = pad_rows(np.asarray(region.unormed, np.float32), npad)
        tmask = pad_rows(np.ones(npts, bool), npad, False)

        if has_tregion:
            treg_ctr = np.asarray(tregion.ellipsoid_center, np.float32)
            treg_invcov = np.asarray(tregion.ellipsoid_invcov, np.float32)
            treg_enlarge = np.float32(tregion.enlarge)
            num_params = len(treg_ctr)
        else:
            num_params = x_dim
            treg_ctr = np.zeros(num_params, np.float32)
            treg_invcov = np.eye(num_params, dtype=np.float32)
            treg_enlarge = np.float32(1.0)

        maxr = region.maxradiussq if region.maxradiussq is not None else 0.0
        tbox_lo = np.asarray(region.bbox_lo, np.float32) - np.float32(maxr) ** 0.5
        tbox_hi = np.asarray(region.bbox_hi, np.float32) + np.float32(maxr) ** 0.5

        if naccept_budget is None:
            # half the live-point count: ample to keep the consumer fed
            # past the next refill, small enough that a high-acceptance
            # batch cannot burn evaluations on points that will be stale
            # before they are reached
            naccept_budget = max(64, npts // 2)
        if method is None:
            method = METHOD_ELLIPSOID
        if kind != 'mlfriends' and method == METHOD_POINTS:
            method = METHOD_ELLIPSOID

        propose = self._get_propose(ndraw, kind, has_tregion)
        self.key, sub = jax.random.split(self.key)
        if self.nshards > 1:
            sub = jax.random.split(sub, self.nshards)
        out = propose(
            sub, tpoints, tmask, np.int32(npts), T, invT, ctr,
            np.float32(maxr),
            np.asarray(region.ellipsoid_center, np.float32),
            np.asarray(region.ellipsoid_invcov, np.float32),
            np.float32(region.enlarge),
            np.asarray(region.ellipsoid_axes_T, np.float32),
            treg_ctr, treg_invcov, treg_enlarge,
            tbox_lo, tbox_hi, np.float32(Lmin), np.int32(method),
            np.int32(naccept_budget))
        try:
            out.copy_to_host_async()
        except Exception:
            pass
        return out, num_params, ndraw
