"""Run nested sampling with a scalar (one point per call) C likelihood.

This variant passes one parameter vector per function call. Function
calls are expensive; the vectorized runc.py way is recommended — it is
also what feeds the device pipeline best. Build the library first::

    make
    python runcsimple.py
"""
import ctypes
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))

from ultranest_tpu import ReactiveNestedSampler  # noqa: E402

myclib = ctypes.CDLL(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "mylib.so"))

myclib.my_c_transform.argtypes = [
    np.ctypeslib.ndpointer(dtype=np.float64, ndim=1, flags='C_CONTIGUOUS'),
    ctypes.c_size_t]
myclib.my_c_likelihood.argtypes = [
    np.ctypeslib.ndpointer(dtype=np.float64, ndim=1, flags='C_CONTIGUOUS'),
    ctypes.c_size_t]
myclib.my_c_likelihood.restype = ctypes.c_double


def mytransformwrapper(cube):
    """Call the C transform on one unit-cube point."""
    params = cube.copy()
    myclib.my_c_transform(params, params.size)
    return params


def mylikelihoodwrapper(params):
    """Call the C likelihood on one parameter point."""
    return myclib.my_c_likelihood(
        np.ascontiguousarray(params, dtype=np.float64), params.size)


if __name__ == '__main__':
    paramnames = ["a", "b", "c"]
    sampler = ReactiveNestedSampler(paramnames, mylikelihoodwrapper,
                                    transform=mytransformwrapper)
    sampler.run(min_num_live_points=100, viz_callback=False)
    sampler.print_results()
    sampler.plot()
