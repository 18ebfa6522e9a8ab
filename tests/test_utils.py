import numpy as np
import pytest

from ultranest_tpu.utils import (distributed_work_chunk_size,
                                 is_affine_transform,
                                 normalised_kendall_tau_distance, quantile,
                                 resample_equal, submasks, vectorize,
                                 vol_prefactor)


def test_vectorize():
    def myfunc(x):
        return (x**2).sum()

    myvfunc = vectorize(myfunc)
    a = np.array([1.2, 2.3, 3.4])
    assert myvfunc([a])[0] == myfunc(a)
    assert myvfunc.__name__ == 'myfunc'


def test_vol_prefactor():
    assert np.isclose(vol_prefactor(1), 2)
    assert np.isclose(vol_prefactor(2), np.pi)
    assert np.isclose(vol_prefactor(3), 4 * np.pi / 3)
    assert np.isclose(vol_prefactor(4), np.pi**2 / 2)


def test_resample_equal():
    rng = np.random.RandomState(42)
    x = np.arange(4).reshape((4, 1)).astype(float)
    w = np.array([0.25, 0.25, 0.25, 0.25])
    out = resample_equal(x, w, rstate=rng)
    assert sorted(out[:, 0].tolist()) == [0, 1, 2, 3]

    w = np.array([1.0, 0, 0, 0])
    out = resample_equal(x, w, rstate=rng)
    assert (out == 0).all()

    with pytest.raises(ValueError):
        resample_equal(x, np.array([0.4, 0.4, 0.4, 0.4]), rstate=rng)


def test_resample_equal_statistics():
    rng = np.random.RandomState(1)
    x = np.arange(1000).reshape((-1, 1)).astype(float)
    w = rng.uniform(size=1000)
    w /= w.sum()
    out = resample_equal(x, w, rstate=rng)
    # each sample appears floor or ceil of w*N times
    counts = np.bincount(out[:, 0].astype(int), minlength=1000)
    expected = w * 1000
    assert (np.abs(counts - expected) <= 1).all()


def test_quantile():
    x = np.linspace(0, 1, 1001)
    assert np.isclose(quantile(x, [0.5])[0], 0.5)
    w = np.ones(len(x))
    assert np.isclose(quantile(x, [0.5], weights=w)[0], 0.5, atol=1e-3)
    with pytest.raises(ValueError):
        quantile(x, [1.5])


def test_is_affine_transform():
    rng = np.random.RandomState(0)
    u = rng.uniform(size=(100, 2))
    assert is_affine_transform(u, u)
    assert is_affine_transform(u, u * 2 - 1)
    assert is_affine_transform(u, u * np.array([2, 3]) + np.array([-1, 5]))
    assert not is_affine_transform(u, u**2)


def test_kendall_tau():
    a = np.arange(10)
    assert normalised_kendall_tau_distance(a, a) == 0
    assert normalised_kendall_tau_distance(a, a[::-1]) == 1.0
    rng = np.random.RandomState(2)
    b = rng.permutation(10)
    d = normalised_kendall_tau_distance(a, b)
    assert 0 <= d <= 1
    # check against the O(N^2) definition
    i, j = np.meshgrid(np.arange(10), np.arange(10))
    sa = np.argsort(a)
    sb = np.argsort(b)
    ndis = np.logical_or(
        np.logical_and(sa[i] < sa[j], sb[i] > sb[j]),
        np.logical_and(sa[i] > sa[j], sb[i] < sb[j])).sum()
    assert np.isclose(d, ndis / (10 * 9))


def test_distributed_work_chunk_size():
    for num_total_tasks in range(1, 100):
        for mpi_size in range(1, 10):
            chunks = [distributed_work_chunk_size(num_total_tasks, rank, mpi_size)
                      for rank in range(mpi_size)]
            assert sum(chunks) == num_total_tasks, (num_total_tasks, mpi_size)
            assert max(chunks) - min(chunks) <= 1


def test_submasks():
    mask = np.array([True, False, True, True, False])
    m2 = np.array([False, True, True])
    idx = submasks(mask, m2)
    a = np.arange(5)
    np.testing.assert_array_equal(a[idx], a[mask][m2])
