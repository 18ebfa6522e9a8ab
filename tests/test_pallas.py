"""Pallas kernel correctness (interpreter mode on CPU)."""
import numpy as np

from ultranest_tpu.ops.pallas_kernels import radius_member_pallas


def test_radius_member_matches_bruteforce():
    rng = np.random.RandomState(0)
    tpoints = rng.normal(size=(100, 3)).astype(np.float32)
    tmask = np.ones(100, bool)
    tmask[80:] = False
    cands = rng.normal(size=(500, 3)).astype(np.float32)
    r2 = 0.5
    got = radius_member_pallas(tpoints, tmask, cands, r2, interpret=True)
    d2 = ((cands[:, None, :] - tpoints[None, :, :]) ** 2).sum(axis=2)
    d2[:, ~tmask] = np.inf
    expected = (d2 <= r2).any(axis=1)
    assert (got == expected).all()


def test_radius_member_empty_radius():
    rng = np.random.RandomState(1)
    tpoints = rng.normal(size=(50, 2)).astype(np.float32)
    tmask = np.ones(50, bool)
    cands = tpoints + 10.0
    got = radius_member_pallas(tpoints, tmask, cands, 1e-6, interpret=True)
    assert not got.any()
