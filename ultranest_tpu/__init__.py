# noqa: D400 D205
"""ultranest_tpu performs nested sampling on TPU (JAX/XLA/Pallas) to calculate the Bayesian evidence and posterior samples.

A brand-new TPU-native framework with the capabilities of UltraNest
(https://github.com/JohannesBuchner/UltraNest): reactive nested sampling
with MLFriends/ellipsoid regions, population step samplers, warm start,
checkpoint/resume, and mesh-sharded parallelism.
"""

from .integrator import (NestedSampler, ReactiveNestedSampler, read_file,
                         warmstart_from_similar_file)
from .utils import vectorize

__all__ = ['NestedSampler', 'ReactiveNestedSampler', 'read_file',
           'warmstart_from_similar_file', 'vectorize']

__author__ = """distsys-graft"""
__version__ = '0.1.0'
