"""Property test of the device consume scan against a numpy reference."""
import numpy as np
import pytest

from ultranest_tpu.segmentops import consume_scan


def _reference(live_u, live_L, rows_u, rows_L, rows_valid):
    lu, lL = live_u.copy(), live_L.copy()
    recs = []
    for u_i, L_i, v_i in zip(rows_u, rows_L, rows_valid):
        worst = int(np.argmin(lL))
        Lmin = lL[worst]
        accept = v_i > 0.5 and L_i > Lmin
        rank = int((lL < L_i).sum())
        plateau = (lL == Lmin).sum() > 1
        dup = bool((lL == L_i).any())
        if accept:
            lu[worst] = u_i
            lL[worst] = L_i
        recs.append([float(accept), float(worst), Lmin, float(rank),
                     2.0 * plateau + 1.0 * dup])
    return lu, lL, np.asarray(recs, np.float32)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_consume_scan_matches_reference(seed):
    rng = np.random.RandomState(seed)
    npad, nlive, P, d = 32, 20, 60, 3
    live_u = rng.uniform(size=(npad, d)).astype(np.float32)
    live_L = np.full(npad, np.inf, np.float32)
    live_L[:nlive] = rng.uniform(-5, 0, nlive).astype(np.float32)
    rows_u = rng.uniform(size=(P, d)).astype(np.float32)
    # mix of clear accepts, rejects, and exact duplicates
    rows_L = rng.uniform(-6, 2, P).astype(np.float32)
    rows_L[5] = live_L[3]                      # duplicate of a live value
    rows_valid = (rng.uniform(size=P) < 0.8).astype(np.float32)

    lu_ref, lL_ref, recs_ref = _reference(live_u, live_L, rows_u, rows_L,
                                          rows_valid)
    lu, lL, recs = consume_scan(live_u, live_L, rows_u, rows_L, rows_valid)
    np.testing.assert_array_equal(np.asarray(lL), lL_ref)
    np.testing.assert_array_equal(np.asarray(lu), lu_ref)
    np.testing.assert_array_equal(np.asarray(recs), recs_ref)


def test_whitened_cloud_var_matches_host_variance():
    """Device cloud variance == np.var of the whitened live points,
    padding excluded — the jump-diagnostic normalizer must agree with
    reference_sqdistance_info's cloud branch when the region snapshot
    IS current (the chained-dispatch case then only differs by real
    shrinkage, never by formula)."""
    from ultranest_tpu.segmentops import whitened_cloud_var
    rng = np.random.RandomState(3)
    npad, nlive, d = 32, 21, 5
    live_u = rng.uniform(size=(npad, d)).astype(np.float32)
    live_u[nlive:] = 7.7  # poison the padding: must not contribute
    T = rng.normal(size=(d, d)).astype(np.float32)
    tpack = np.vstack([T, np.zeros((1, d), np.float32)])
    got = float(whitened_cloud_var(live_u, nlive, tpack))
    want = np.var(live_u[:nlive].astype(np.float64) @ T.astype(np.float64),
                  axis=0).sum()
    assert abs(got - want) < 1e-3 * want


def test_pack_segment_ref2_scalar_slot():
    from ultranest_tpu.segmentops import pack_segment
    import jax.numpy as jnp
    P, d = 4, 3
    rows_u = jnp.zeros((P, d), jnp.float32)
    rows_L = jnp.zeros(P, jnp.float32)
    recs = jnp.zeros((P, 6), jnp.float32)
    packed = np.asarray(pack_segment(rows_u, rows_L, recs, 10.0, 0.5, 0.1,
                                     nuseful=7.0, ref2=2.5))
    assert packed[-1, 3] == 7.0 and packed[-1, 4] == 2.5
    packed = np.asarray(pack_segment(rows_u, rows_L, recs, 10.0, 0.5, 0.1))
    assert packed[-1, 4] == 0.0  # engines without jump diagnostics
