# noqa: D400 D205
"""
Benchmark model families
------------------------

The analytic test problems the reference exercises in its examples and
performance docs (`/root/reference/examples/test*.py`,
`docs/performance.rst`), each provided in both host (numpy) and device
(jax) form, with analytic evidences where known.

Every factory returns a :class:`Problem` with ``loglike`` / ``transform``
(numpy, vectorized), ``jax_loglike`` / ``jax_transform`` (jittable), the
parameter names and, where available, the analytic ``logz``.
"""

from .problems import (Problem, asymgauss, corrgauss, corrpeak,
                       dirichlet, eggbox, funnel, gauss, hyperrect,
                       loggamma, multigauss, multishell, pyramid,
                       rosenbrock, shell, sine, slantedeggbox)

__all__ = ['Problem', 'gauss', 'multigauss', 'asymgauss', 'corrgauss',
           'eggbox', 'rosenbrock', 'multishell', 'shell', 'loggamma',
           'funnel', 'pyramid', 'sine', 'corrpeak', 'hyperrect',
           'dirichlet', 'slantedeggbox']
