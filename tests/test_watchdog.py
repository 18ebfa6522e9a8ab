"""Mid-run accelerator loss: the dispatch watchdog degrades to the host.

The reference's crash story is "every point is on disk, just restart"
(/root/reference/README.rst:101). Here the run additionally survives
in-process: a device fetch exceeding the dispatch deadline raises
DeviceLostError, the integrator swaps in host samplers, and the run
finishes with correct logZ.
"""
import time

import numpy as np
import pytest

from ultranest_tpu import ReactiveNestedSampler, models
from ultranest_tpu.parallel import launch
from ultranest_tpu.popfused import FusedPopulationSliceSampler


def _hang_device_after(monkeypatch, ncalls):
    """After *ncalls* fetches, every device fetch blocks past its deadline."""
    real = launch.fetch_replicated
    state = {'n': 0}

    def hanging(x):
        state['n'] += 1
        if state['n'] > ncalls:
            time.sleep(3600)
        return real(x)

    monkeypatch.setattr(launch, 'fetch_replicated', hanging)
    monkeypatch.setenv('ULTRANEST_TPU_DISPATCH_DEADLINE', '1.5')
    return state


def test_fetch_with_deadline_raises(monkeypatch):
    monkeypatch.setattr(launch, 'fetch_replicated',
                        lambda x: time.sleep(3600))
    with pytest.raises(launch.DeviceLostError):
        launch.fetch_with_deadline(np.zeros(3), deadline=0.5)


def test_popfused_run_survives_device_loss(monkeypatch):
    prob = models.gauss(ndim=2, sigma=0.1)
    state = _hang_device_after(monkeypatch, ncalls=3)
    sampler = ReactiveNestedSampler(seed=1,
                                    **prob.sampler_kwargs(use_jax=False))
    sampler.stepsampler = FusedPopulationSliceSampler(
        popsize=64, nsteps=8, jax_loglike=prob.jax_loglike, seed=1)
    with pytest.warns(UserWarning, match='accelerator lost'):
        res = sampler.run(min_num_live_points=100, viz_callback=False,
                          show_status=False, max_num_improvement_loops=0,
                          min_ess=0, dlogz=2.0, frac_remain=0.1)
    assert state['n'] > 3, 'the hang was never triggered'
    # the device sampler was swapped for the host slice sampler
    assert not isinstance(sampler.stepsampler, FusedPopulationSliceSampler)
    assert abs(res['logz'] - prob.logz) < 3 * max(res['logzerr'], 0.5), \
        (res['logz'], prob.logz)


def test_fused_rejection_run_survives_device_loss(monkeypatch):
    prob = models.gauss(ndim=2, sigma=0.1)
    state = _hang_device_after(monkeypatch, ncalls=3)
    sampler = ReactiveNestedSampler(seed=2,
                                    **prob.sampler_kwargs(use_jax=True))
    assert sampler.fused_sampler is not None
    with pytest.warns(UserWarning, match='accelerator lost'):
        res = sampler.run(min_num_live_points=100, viz_callback=False,
                          show_status=False, max_num_improvement_loops=0,
                          min_ess=0, dlogz=2.0, frac_remain=0.1)
    assert state['n'] > 3
    assert sampler.fused_sampler is None
    assert abs(res['logz'] - prob.logz) < 3 * max(res['logzerr'], 0.5), \
        (res['logz'], prob.logz)
