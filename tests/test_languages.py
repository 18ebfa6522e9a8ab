"""Foreign-language likelihood integration (C / C++ via ctypes)."""
import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

LANGDIR = os.path.join(os.path.dirname(__file__), '..', 'languages')


def build(subdir, target):
    path = os.path.join(LANGDIR, subdir)
    res = subprocess.run(['make', '-C', path], capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    return os.path.join(path, target)


@pytest.mark.skipif(shutil.which('cc') is None and shutil.which('gcc') is None,
                    reason='no C compiler')
def test_c_likelihood_runs():
    lib = ctypes.CDLL(build('c', 'mylib.so'))
    lib.my_c_likelihood_vectorized.argtypes = [
        np.ctypeslib.ndpointer(dtype=np.float64, ndim=2,
                               flags='C_CONTIGUOUS'),
        ctypes.c_size_t, ctypes.c_size_t,
        np.ctypeslib.ndpointer(dtype=np.float64, ndim=1,
                               flags='C_CONTIGUOUS')]
    lib.my_c_transform_vectorized.argtypes = [
        np.ctypeslib.ndpointer(dtype=np.float64, ndim=2,
                               flags='C_CONTIGUOUS'),
        ctypes.c_size_t, ctypes.c_size_t]

    def transform(cube):
        params = np.ascontiguousarray(cube.copy())
        lib.my_c_transform_vectorized(params, params.shape[1],
                                      params.shape[0])
        return params

    def loglike(params):
        params = np.ascontiguousarray(params)
        like = np.zeros(len(params))
        lib.my_c_likelihood_vectorized(params, params.shape[1],
                                       params.shape[0], like)
        return like

    # sanity: python twin agrees
    rng = np.random.RandomState(0)
    u = rng.uniform(size=(10, 3))
    p = transform(u)
    np.testing.assert_allclose(p, u * 2 - 1)
    centers = np.array([0.4, 0.5, 0.6]) - 0.5
    expected = -0.5 * (((p - centers) / 0.1) ** 2).sum(axis=1) \
        - 0.5 * 3 * np.log(2 * np.pi * 0.1**2)
    np.testing.assert_allclose(loglike(p), expected, rtol=1e-12)

    from ultranest_tpu import ReactiveNestedSampler
    sampler = ReactiveNestedSampler(['a', 'b', 'c'], loglike,
                                    transform=transform, vectorized=True,
                                    seed=21)
    res = sampler.run(min_num_live_points=100, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.1)
    # prior volume 2^3, normalized gaussian inside -> logz = -log 8
    assert abs(res['logz'] - (-np.log(8))) < 1.0, res['logz']


@pytest.mark.skipif(shutil.which('g++') is None and shutil.which('c++') is None,
                    reason='no C++ compiler')
def test_cpp_likelihood_runs():
    lib = ctypes.CDLL(build('c++', 'mycpplib.so'))
    lib.my_cpp_likelihood_vectorized.argtypes = [
        np.ctypeslib.ndpointer(dtype=np.float64, ndim=2,
                               flags='C_CONTIGUOUS'),
        ctypes.c_size_t, ctypes.c_size_t,
        np.ctypeslib.ndpointer(dtype=np.float64, ndim=1,
                               flags='C_CONTIGUOUS')]

    def loglike(params):
        params = np.ascontiguousarray(params)
        like = np.zeros(len(params))
        lib.my_cpp_likelihood_vectorized(params, params.shape[1],
                                         params.shape[0], like)
        return like

    rng = np.random.RandomState(1)
    p = rng.uniform(size=(10, 3))
    r = np.sqrt(((p - 0.5) ** 2).sum(axis=1))
    expected = -0.5 * ((r - 0.4) / 0.02) ** 2 \
        - 0.5 * np.log(2 * np.pi * 0.02**2)
    np.testing.assert_allclose(loglike(p), expected, rtol=1e-12)

    from ultranest_tpu import ReactiveNestedSampler
    sampler = ReactiveNestedSampler(['a', 'b', 'c'], loglike,
                                    vectorized=True, seed=22)
    res = sampler.run(min_num_live_points=200, viz_callback=False,
                      show_status=False, max_num_improvement_loops=0,
                      min_ess=0, dlogz=2.0, frac_remain=0.1)
    assert np.isfinite(res['logz'])


@pytest.mark.skipif(shutil.which('cc') is None and shutil.which('gcc') is None,
                    reason='no C compiler')
def test_c_scalar_likelihood_runs():
    """Scalar (one point per call) C entry points used by runcsimple.py."""
    lib = ctypes.CDLL(build('c', 'mylib.so'))
    lib.my_c_likelihood.argtypes = [
        np.ctypeslib.ndpointer(dtype=np.float64, ndim=1,
                               flags='C_CONTIGUOUS'),
        ctypes.c_size_t]
    lib.my_c_likelihood.restype = ctypes.c_double
    lib.my_c_transform.argtypes = [
        np.ctypeslib.ndpointer(dtype=np.float64, ndim=1,
                               flags='C_CONTIGUOUS'),
        ctypes.c_size_t]

    u = np.array([0.3, 0.5, 0.7])
    p = u.copy()
    lib.my_c_transform(p, p.size)
    np.testing.assert_allclose(p, u * 2 - 1)
    centers = np.array([0.4, 0.5, 0.6]) - 0.5
    expected = -0.5 * (((p - centers) / 0.1) ** 2).sum() \
        - 0.5 * 3 * np.log(2 * np.pi * 0.1**2)
    np.testing.assert_allclose(lib.my_c_likelihood(p, p.size), expected,
                               rtol=1e-12)


@pytest.mark.skipif(shutil.which('g++') is None and shutil.which('c++') is None,
                    reason='no C++ compiler')
def test_cpp_scalar_likelihood_runs():
    """Scalar (one point per call) C++ entry points used by runcppsimple.py."""
    lib = ctypes.CDLL(build('c++', 'mycpplib.so'))
    lib.my_cpp_likelihood.argtypes = [
        np.ctypeslib.ndpointer(dtype=np.float64, ndim=1,
                               flags='C_CONTIGUOUS'),
        ctypes.c_size_t]
    lib.my_cpp_likelihood.restype = ctypes.c_double

    p = np.array([0.3, 0.5, 0.7])
    r = np.sqrt(((p - 0.5) ** 2).sum())
    expected = -0.5 * ((r - 0.4) / 0.02) ** 2 \
        - 0.5 * np.log(2 * np.pi * 0.02**2)
    np.testing.assert_allclose(lib.my_cpp_likelihood(p, p.size), expected,
                               rtol=1e-12)


@pytest.mark.skipif(shutil.which('julia') is None, reason='julia unavailable')
def test_julia_binding_runs(tmp_path):
    """End-to-end julia example (only when a julia interpreter exists)."""
    res = subprocess.run(['julia', os.path.join(LANGDIR, 'julia', 'runjl.jl')],
                         capture_output=True, text=True, cwd=str(tmp_path),
                         timeout=1200)
    assert res.returncode == 0, res.stderr


@pytest.mark.skipif(shutil.which('Rscript') is None, reason='R unavailable')
def test_r_binding_runs(tmp_path):
    """End-to-end R example (only when an R interpreter exists)."""
    res = subprocess.run(['Rscript', os.path.join(LANGDIR, 'r', 'runr.r')],
                         capture_output=True, text=True, cwd=str(tmp_path),
                         timeout=1200)
    assert res.returncode == 0, res.stderr


def test_language_examples_present():
    """Every reference language binding has a counterpart here."""
    expected = {
        'c': ['Makefile', 'mylib.c', 'runc.py', 'runcsimple.py'],
        'c++': ['Makefile', 'mycpplib.cpp', 'runcpp.py', 'runcppsimple.py'],
        'fortran': ['Makefile'],
        'julia': ['runjl.jl'],
        'python': ['runpy.py'],
        'r': ['runr.r'],
    }
    for sub, files in expected.items():
        for fname in files:
            path = os.path.join(LANGDIR, sub, fname)
            assert os.path.exists(path), path
