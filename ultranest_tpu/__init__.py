# noqa: D400 D205
"""ultranest_tpu performs nested sampling on TPU (JAX/XLA/Pallas) to calculate the Bayesian evidence and posterior samples.

A brand-new TPU-native framework with the capabilities of UltraNest
(https://github.com/JohannesBuchner/UltraNest): reactive nested sampling
with MLFriends/ellipsoid regions, population step samplers, warm start,
checkpoint/resume, and mesh-sharded parallelism.
"""

import os as _os


def _honor_platform_request():
    """Make the JAX_PLATFORMS environment variable actually win.

    Accelerator plugins may register themselves as the default backend
    even when the user pinned ``JAX_PLATFORMS=cpu`` (observed with
    remote-TPU plugins); jax.config.update enforces the user's choice.
    """
    platform = _os.environ.get('JAX_PLATFORMS')
    if not platform:
        return
    try:
        import jax
        jax.config.update('jax_platforms', platform)
    except Exception:
        pass


def _enable_persistent_compile_cache():
    """Point jax at an on-disk compilation cache.

    Region/stepper kernels are recompiled per process otherwise; on a
    remote-compiler TPU backend a single cold compile can take minutes,
    dominating small runs. Explicit user configuration
    (JAX_COMPILATION_CACHE_DIR or jax.config) always wins.
    """
    platform = _os.environ.get('JAX_PLATFORMS', '') or 'default'
    if platform in ('cpu', ''):
        # XLA:CPU AOT cache artifacts are not reliably reloadable (the
        # recorded target-machine features mismatch the host detection
        # and loading them corrupts the heap) — never cache for cpu
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            cache = _os.environ.get(
                'ULTRANEST_TPU_COMPILE_CACHE',
                _os.path.join(_os.path.expanduser('~'), '.cache',
                              'ultranest_tpu',
                              'jax-' + platform.replace(',', '-')))
            jax.config.update('jax_compilation_cache_dir', cache)
            # low threshold: every accelerator program persists. Even a
            # ~1 s compile is worth caching — each sampler instance
            # builds fresh jit closures, and without a disk hit the
            # identical program recompiles per instance (measured 1.75 s
            # per eggbox run on the TPU tunnel)
            jax.config.update(
                'jax_persistent_cache_min_compile_time_secs', 0.1)
    except Exception:  # jax missing or too old: host paths still work
        pass


_honor_platform_request()
_enable_persistent_compile_cache()

from .integrator import (NestedSampler, ReactiveNestedSampler, read_file,
                         warmstart_from_similar_file)
from .utils import vectorize

__all__ = ['NestedSampler', 'ReactiveNestedSampler', 'read_file',
           'warmstart_from_similar_file', 'vectorize']

__author__ = """distsys-graft"""
__version__ = '0.1.0'
