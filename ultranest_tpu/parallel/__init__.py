# noqa: D400 D205
"""
Mesh-sharded parallelism (the MPI replacement)
----------------------------------------------

The reference distributes work over MPI ranks with a gather-to-root-then-
broadcast (= allgather) idiom (`/root/reference/ultranest/integrator.py`
call sites listed in SURVEY.md §5.8). Here the same invariant — every
shard holds the full tree and live-point set; only candidate generation
and bootstrap rounds are sharded — is expressed natively over a JAX
device mesh:

* candidate generation + likelihood evaluation: ``shard_map`` over the
  candidate batch axis, ``all_gather`` of results, ``psum`` of call counts
  (riding ICI, not DCN);
* deterministic per-shard RNG via ``jax.random.fold_in(key, axis_index)``
  (replacing the reference's rank-hashed seeds,
  integrator.py:1239-1251);
* strategy reductions (Llo/Lhi/Nlive_min) via ``pmin``/``pmax``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ['make_mesh', 'make_parallel_step', 'parallel_propose_evaluate']


def make_mesh(n_devices=None, axis_name='ranks'):
    """Build a 1-axis device mesh over the first *n_devices* devices.

    Raises if fewer than *n_devices* are available — silently shrinking
    the mesh would make multi-shard tests pass without testing anything.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            'requested a %d-device mesh but only %d jax device(s) are '
            'available (platform=%s); set '
            'XLA_FLAGS=--xla_force_host_platform_device_count=%d with '
            'JAX_PLATFORMS=cpu for a virtual mesh'
            % (n_devices, len(devices), devices[0].platform, n_devices))
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def parallel_propose_evaluate(mesh, loglike, transform, x_dim,
                              ndraw_per_shard=128, axis_name='ranks'):
    """Build a sharded propose+evaluate function.

    Each shard draws its own candidates inside the enlarged wrapping
    ellipsoid with a ``fold_in``-derived key, filters and evaluates them,
    then results are allgathered and call counts psum-reduced — the
    TPU-native equivalent of the reference's per-rank candidate generation
    with gather+bcast merge (integrator.py:1916-1933).

    Returns a jitted function
    ``f(key, ell_ctr, ell_axes_T, ell_invcov, enlarge, Lmin)
    -> (u, v, logl, accepted, ncall)`` with fully replicated outputs.
    """
    nshards = mesh.devices.size

    def shard_fn(key, ell_ctr, ell_axes_T, ell_invcov, enlarge, Lmin):
        key = jax.random.fold_in(key[0], jax.lax.axis_index(axis_name))
        kdir, krad = jax.random.split(key)
        z = jax.random.normal(kdir, (ndraw_per_shard, x_dim), jnp.float32)
        z = z / jnp.linalg.norm(z, axis=1, keepdims=True)
        r = jax.random.uniform(krad, (ndraw_per_shard, 1),
                               jnp.float32) ** (1.0 / x_dim)
        offs = z * r * jnp.sqrt(enlarge)
        u = ell_ctr[None, :] + jnp.dot(offs, ell_axes_T,
                                       preferred_element_type=jnp.float32)
        in_cube = jnp.logical_and(u > 0, u < 1).all(axis=1)
        d = u - ell_ctr[None, :]
        m = jnp.einsum('ij,jk,ik->i', d, ell_invcov, d)
        member = jnp.logical_and(in_cube, m <= enlarge)

        v = transform(u)
        logl = jnp.where(member, loglike(v), -jnp.inf)
        accepted = jnp.logical_and(member, logl > Lmin)
        ncall = jax.lax.psum(jnp.sum(member), axis_name)

        u_all = jax.lax.all_gather(u, axis_name, tiled=True)
        v_all = jax.lax.all_gather(v, axis_name, tiled=True)
        logl_all = jax.lax.all_gather(logl, axis_name, tiled=True)
        acc_all = jax.lax.all_gather(accepted, axis_name, tiled=True)
        return u_all, v_all, logl_all, acc_all, ncall

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P()), check_vma=False)
    return jax.jit(mapped)


def make_parallel_step(loglike, transform, x_dim, mesh,
                       ndraw_per_shard=128, nbootstraps=8,
                       axis_name='ranks'):
    """Build the full sharded nested-sampling step.

    One call performs, across the mesh:

    1. sharded candidate proposal + likelihood evaluation (fold_in RNG),
    2. allgather + psum merge,
    3. replacement of the worst live point with the first accepted
       candidate (all shards advance the replicated state in lockstep),
    4. the vectorized (1+nbootstraps)-estimator evidence update of
       :class:`ultranest_tpu.netiter.MultiCounter` as device math.

    Returns ``(step_fn, init_fn)``:

    * ``init_fn(key, nlive)`` -> replicated state pytree
    * ``step_fn(state, key)`` -> (state, aux) advancing one iteration
    """
    nb1 = 1 + nbootstraps

    def init_fn(key, nlive):
        ku, kb = jax.random.split(jax.random.PRNGKey(key)
                                  if np.ndim(key) == 0 else key)
        u = jax.random.uniform(ku, (nlive, x_dim), jnp.float32,
                               minval=0.01, maxval=0.99)
        logl = loglike(transform(u))
        # bootstrap root masks: counter 0 has everything
        picks = jax.random.randint(kb, (nb1 - 1, nlive), 0, nlive)
        masks = jnp.zeros((nb1 - 1, nlive), bool).at[
            jnp.arange(nb1 - 1)[:, None], picks].set(True)
        rootids = jnp.concatenate(
            [jnp.ones((1, nlive), bool), masks], axis=0)
        return dict(
            live_u=u, live_logl=logl, rootids=rootids,
            all_logZ=jnp.full((nb1,), -jnp.inf, jnp.float32),
            all_logVol=jnp.zeros((nb1,), jnp.float32),
            ncall=jnp.zeros((), jnp.int32),
        )

    def step_fn(state, key):
        live_u = state['live_u']
        live_logl = state['live_logl']
        nlive = live_u.shape[0]

        worst = jnp.argmin(live_logl)
        Lmin = live_logl[worst]

        # region proxy: wrapping ellipsoid of the live points (diagonal
        # preconditioned covariance), replicated on all shards
        ctr = jnp.mean(live_u, axis=0)
        xc = live_u - ctr
        cov = jnp.dot(xc.T, xc, preferred_element_type=jnp.float32) \
            / (nlive - 1) * (x_dim + 2)
        cov = cov + jnp.eye(x_dim) * 1e-6
        w, vec = jnp.linalg.eigh(cov)
        w = jnp.maximum(w, w[-1] * 1e-6)
        invcov = (vec / w[None, :]) @ vec.T
        axes_T = (vec * jnp.sqrt(w)[None, :]).T
        enlarge = jnp.float32(1.5)

        def shard_propose(key, ctr, axes_T, invcov, enlarge, Lmin):
            key = jax.random.fold_in(key[0], jax.lax.axis_index(axis_name))
            kdir, krad = jax.random.split(key)
            z = jax.random.normal(kdir, (ndraw_per_shard, x_dim), jnp.float32)
            z = z / jnp.linalg.norm(z, axis=1, keepdims=True)
            r = jax.random.uniform(krad, (ndraw_per_shard, 1),
                                   jnp.float32) ** (1.0 / x_dim)
            u = ctr[None, :] + jnp.dot(z * r * jnp.sqrt(enlarge), axes_T,
                                       preferred_element_type=jnp.float32)
            in_cube = jnp.logical_and(u > 0, u < 1).all(axis=1)
            logl = jnp.where(in_cube, loglike(transform(u)), -jnp.inf)
            nc = jax.lax.psum(jnp.sum(in_cube), axis_name)
            u_all = jax.lax.all_gather(u, axis_name, tiled=True)
            logl_all = jax.lax.all_gather(logl, axis_name, tiled=True)
            return u_all, logl_all, nc

        u_all, logl_all, nc = jax.shard_map(
            shard_propose, mesh=mesh,
            in_specs=(P(axis_name), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()), check_vma=False)(
                jax.random.split(key, mesh.devices.size),
                ctr, axes_T, invcov, enlarge, Lmin)

        accepted = logl_all > Lmin
        any_acc = jnp.any(accepted)
        pick = jnp.argmax(accepted)
        new_u = jnp.where(any_acc, u_all[pick], live_u[worst])
        new_logl = jnp.where(any_acc, logl_all[pick], live_logl[worst])

        # vectorized multi-estimator evidence update (cf. MultiCounter)
        nlive_c = jnp.sum(state['rootids'], axis=1)
        nlive_safe = jnp.maximum(nlive_c, 1)
        logleft = jnp.log1p(-jnp.exp(-1.0 / nlive_safe))
        logwidth = logleft + state['all_logVol']
        wi = logwidth + Lmin
        all_logZ = jnp.logaddexp(state['all_logZ'], wi)
        all_logVol = state['all_logVol'] - 1.0 / nlive_safe

        state = dict(
            live_u=live_u.at[worst].set(new_u),
            live_logl=live_logl.at[worst].set(new_logl),
            rootids=state['rootids'],
            all_logZ=all_logZ,
            all_logVol=all_logVol,
            ncall=state['ncall'] + nc,
        )
        aux = dict(Lmin=Lmin, logZ=all_logZ[0],
                   logZerr_bs=jnp.std(all_logZ[1:]), accepted=any_acc)
        return state, aux

    return jax.jit(step_fn), init_fn
