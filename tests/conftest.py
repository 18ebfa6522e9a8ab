"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The dev environment pins JAX_PLATFORMS=axon (TPU tunnel); tests must run
on CPU with 8 virtual devices to exercise the multi-chip sharding paths.
Flags must be set before the jax backend initializes.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
xla_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
