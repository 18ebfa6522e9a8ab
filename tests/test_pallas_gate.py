"""The Pallas membership kernel auto-enables when compiles are cheap.

Round-3 documented the decision rule (fast Mosaic compile -> the
VMEM-resident kernel wins for d>=4); round 4 automates it with a
one-time deadline-bounded compile probe (fused._pallas_compile_is_cheap).
Real Mosaic compiles need a TPU backend, so the decision logic is
tested with the probe and availability stubbed.
"""
import numpy as np
import pytest

import ultranest_tpu.fused as fused
import ultranest_tpu.ops.pallas_kernels as pk


@pytest.fixture(autouse=True)
def _reset_probe(monkeypatch):
    monkeypatch.setattr(fused, '_PALLAS_PROBE_VERDICT', None)
    yield


def test_default_off_without_pallas_backend(monkeypatch):
    monkeypatch.setattr(fused, '_PALLAS_ENV', None)
    monkeypatch.setattr(pk, 'pallas_available', lambda: False)
    assert not fused._use_pallas_membership(8, 512)


def test_auto_enables_when_probe_fast(monkeypatch):
    monkeypatch.setattr(fused, '_PALLAS_ENV', None)
    monkeypatch.setattr(pk, 'pallas_available', lambda: True)
    monkeypatch.setattr(fused, '_pallas_compile_is_cheap', lambda: True)
    assert fused._use_pallas_membership(8, 512)
    # losing shapes stay off even with cheap compiles
    assert not fused._use_pallas_membership(2, 512)
    assert not fused._use_pallas_membership(8, pk.MAX_VMEM_POINTS + 1)


def test_auto_stays_off_when_probe_slow(monkeypatch):
    monkeypatch.setattr(fused, '_PALLAS_ENV', None)
    monkeypatch.setattr(pk, 'pallas_available', lambda: True)
    monkeypatch.setattr(fused, '_pallas_compile_is_cheap', lambda: False)
    assert not fused._use_pallas_membership(8, 512)


def test_env_overrides(monkeypatch):
    monkeypatch.setattr(pk, 'pallas_available', lambda: True)
    monkeypatch.setattr(fused, '_pallas_compile_is_cheap',
                        lambda: (_ for _ in ()).throw(
                            AssertionError('probe must be skipped')))
    monkeypatch.setattr(fused, '_PALLAS_ENV', '0')
    assert not fused._use_pallas_membership(8, 512)
    monkeypatch.setattr(fused, '_PALLAS_ENV', '1')
    assert fused._use_pallas_membership(8, 512)
    assert not fused._use_pallas_membership(2, 512)
    monkeypatch.setattr(fused, '_PALLAS_ENV', 'force')
    assert fused._use_pallas_membership(2, 512)


def test_probe_times_out_cleanly(monkeypatch):
    """A hung compile must not block the caller past the deadline."""
    import time

    monkeypatch.setattr(fused, '_PALLAS_ENV', None)
    monkeypatch.setattr(pk, 'pallas_available', lambda: True)
    monkeypatch.setattr(pk, 'radius_member_pallas',
                        lambda *a, **k: time.sleep(3600))
    monkeypatch.setenv('ULTRANEST_TPU_PALLAS_PROBE_S', '0.2')
    t0 = time.time()
    assert not fused._use_pallas_membership(8, 512)
    assert time.time() - t0 < 5.0
    # the verdict is cached: no second wait
    t0 = time.time()
    assert not fused._use_pallas_membership(8, 512)
    assert time.time() - t0 < 0.05
