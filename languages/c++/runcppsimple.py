"""Run nested sampling with a scalar (one point per call) C++ likelihood.

This variant passes one parameter vector per function call. Function
calls are expensive; the vectorized runcpp.py way is recommended. Build
the library first::

    make
    python runcppsimple.py
"""
import ctypes
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))

from ultranest_tpu import ReactiveNestedSampler  # noqa: E402

mylib = ctypes.CDLL(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "mycpplib.so"))

mylib.my_cpp_likelihood.argtypes = [
    np.ctypeslib.ndpointer(dtype=np.float64, ndim=1, flags='C_CONTIGUOUS'),
    ctypes.c_size_t]
mylib.my_cpp_likelihood.restype = ctypes.c_double


def mylikelihoodwrapper(params):
    """Call the C++ likelihood on one parameter point."""
    return mylib.my_cpp_likelihood(
        np.ascontiguousarray(params, dtype=np.float64), params.size)


if __name__ == '__main__':
    paramnames = ["a", "b", "c"]
    sampler = ReactiveNestedSampler(paramnames, mylikelihoodwrapper)
    sampler.run(min_num_live_points=100, viz_callback=False)
    sampler.print_results()
    sampler.plot()
