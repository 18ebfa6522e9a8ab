"""Run nested sampling with a vectorized C likelihood (via ctypes).

Build the library first::

    make
    python runc.py
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

myclib.my_c_transform_vectorized.argtypes = [
    np.ctypeslib.ndpointer(dtype=np.float64, ndim=2, flags='C_CONTIGUOUS'),
    ctypes.c_size_t,
    ctypes.c_size_t]

myclib.my_c_likelihood_vectorized.argtypes = [
    np.ctypeslib.ndpointer(dtype=np.float64, ndim=2, flags='C_CONTIGUOUS'),
    ctypes.c_size_t,
    ctypes.c_size_t,
    np.ctypeslib.ndpointer(dtype=np.float64, ndim=1, flags='C_CONTIGUOUS')]


def mytransformwrapper(cube):
    """Call the C transform on a batch of unit-cube points."""
    params = np.ascontiguousarray(cube.copy())
    myclib.my_c_transform_vectorized(params, params.shape[1],
                                     params.shape[0])
    return params


def mylikelihoodwrapper(params):
    """Call the C likelihood on a batch of parameter points."""
    params = np.ascontiguousarray(params)
    like = np.zeros(len(params))
    myclib.my_c_likelihood_vectorized(params, params.shape[1],
                                      params.shape[0], like)
    return like


if __name__ == '__main__':
    paramnames = ["a", "b", "c"]
    sampler = ReactiveNestedSampler(paramnames, mylikelihoodwrapper,
                                    transform=mytransformwrapper,
                                    vectorized=True)
    sampler.run(min_num_live_points=400, viz_callback=False)
    sampler.print_results()
