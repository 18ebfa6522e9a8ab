import numpy as np
import pytest

from ultranest_tpu.ordertest import UniformOrderAccumulator, infinite_U_zscore


def test_invalid_order():
    acc = UniformOrderAccumulator()
    with pytest.raises(ValueError):
        acc.add(5, 4)
    with pytest.raises(ValueError):
        acc.add(-1, 4)


def test_uniform_is_unbiased():
    rng = np.random.RandomState(1)
    N = 400
    acc = UniformOrderAccumulator()
    for _ in range(10000):
        acc.add(rng.randint(N + 1), N)
    assert abs(acc.zscore) < 4


def test_biased_is_detected():
    rng = np.random.RandomState(1)
    N = 400
    acc = UniformOrderAccumulator()
    for _ in range(10000):
        acc.add(rng.randint(N // 2), N)  # only low ranks
    assert acc.zscore < -10


def test_zscore_agrees_with_batch():
    rng = np.random.RandomState(3)
    N = 100
    sample = rng.randint(N + 1, size=1000)
    acc = UniformOrderAccumulator()
    for s in sample:
        acc.add(s, N)
    batch = infinite_U_zscore(sample, N)
    assert np.isclose(acc.zscore, batch, atol=0.2), (acc.zscore, batch)
    assert len(acc) == 1000
    acc.reset()
    assert acc.zscore == 0
