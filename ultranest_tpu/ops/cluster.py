# noqa: D400 D205
"""
Friends-of-friends clustering on device
---------------------------------------

TPU-native replacement for the reference's iterative cluster-growing loop
(`/root/reference/ultranest/mlfriends.pyx:275-384`). Two points belong to
the same cluster iff they are connected through pairs closer than the
MLFriends radius — i.e. connected components of the r-neighbourhood graph.

Implementation: label propagation with pointer jumping
(``labels <- min(labels, labels[labels])``) inside one
``lax.while_loop``, converging in O(log N) rounds; the adjacency matrix
comes from a single MXU Gram matmul.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .pairwise import pairwise_sqdist, pad_rows, round_up

__all__ = ['connected_components']


@jax.jit
def _label_propagation(tpoints, valid, radiussq):
    n = tpoints.shape[0]
    d2 = pairwise_sqdist(tpoints, tpoints)
    adj = d2 <= radiussq
    vmat = jnp.logical_and(valid[:, None], valid[None, :])
    adj = jnp.logical_and(adj, vmat)
    # every valid point is its own neighbour
    adj = jnp.logical_or(adj, jnp.logical_and(
        jnp.eye(n, dtype=bool), valid[:, None] & valid[None, :]))

    init = jnp.where(valid, jnp.arange(n), n)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        neigh = jnp.where(adj, labels[None, :], n)
        new = jnp.minimum(labels, jnp.min(neigh, axis=1))
        # pointer jumping: adopt the label of my current representative
        rep = jnp.where(new < n, new, 0)
        new = jnp.minimum(new, jnp.where(new < n, labels[rep], n))
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return labels


def connected_components(tpoints, radiussq):
    """Connected components of the radius graph over *tpoints*.

    Parameters
    ----------
    tpoints: array (N, d)
        points (whitened space)
    radiussq: float
        connection threshold on squared distance

    Returns
    -------
    labels: int array (N,)
        component representative index (the smallest member index) per
        point; renumbering / old-id matching is host-side policy
        (:func:`ultranest_tpu.mlfriends.update_clusters`).
    """
    tpoints = np.asarray(tpoints, dtype=np.float32)
    n = len(tpoints)
    npd = round_up(n)
    valid = pad_rows(np.ones(n, bool), npd, False)
    labels = _label_propagation(pad_rows(tpoints, npd), valid,
                                jnp.float32(radiussq))
    return np.asarray(labels)[:n]
