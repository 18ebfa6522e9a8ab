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


def test_radius_member_tiny_scales():
    """Direct-difference kernel resolves distances the Gram trick cannot."""
    rng = np.random.RandomState(2)
    # tight cluster far from the origin: Gram cancellation regime
    tpoints = (0.8 + 1e-5 * rng.normal(size=(64, 2))).astype(np.float32)
    tmask = np.ones(64, bool)
    cands = (0.8 + 1e-5 * rng.normal(size=(128, 2))).astype(np.float32)
    r2 = np.float64(2e-10)
    got = radius_member_pallas(tpoints, tmask, cands, r2, interpret=True)
    d2 = ((cands[:, None, :].astype(np.float64)
           - tpoints[None, :, :]) ** 2).sum(axis=2)
    expected = (d2 <= r2).any(axis=1)
    # f32 quantization flips borderline cases only
    assert (got == expected).mean() > 0.9


def test_bootstrap_radius_pallas_matches_xla():
    from ultranest_tpu.ops.bootstrap import (_radius_kernel,
                                             make_bootstrap_masks)
    from ultranest_tpu.ops.pairwise import pad_rows, round_up
    from ultranest_tpu.ops.pallas_kernels import bootstrap_radius_pallas

    rng = np.random.RandomState(3)
    tpoints = rng.normal(size=(150, 5)).astype(np.float32)
    masks = make_bootstrap_masks(len(tpoints), 20, rng=rng)

    npd = round_up(len(tpoints))
    valid = pad_rows(np.ones(len(tpoints), bool), npd, False)
    mk = np.zeros((len(masks), npd), dtype=bool)
    mk[:, :len(tpoints)] = masks
    expected = float(_radius_kernel(pad_rows(tpoints, npd), valid, mk))

    got = bootstrap_radius_pallas(tpoints, masks, interpret=True)
    np.testing.assert_allclose(got, expected, rtol=1e-6)
