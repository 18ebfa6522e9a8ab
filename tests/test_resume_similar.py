"""Resume-similar and warm-start integration tests."""
import os
import shutil
import tempfile

import numpy as np
import pytest

from ultranest_tpu import ReactiveNestedSampler, warmstart_from_similar_file


def loglike_a(theta):
    return -0.5 * (((theta - 0.5) / 0.1) ** 2).sum(axis=1)


def loglike_b(theta):
    # slightly different widths: 'similar' likelihood
    return -0.5 * (((theta - 0.5) / 0.11) ** 2).sum(axis=1)


def transform(x):
    return np.asarray(x)


RUN_KWARGS = dict(min_num_live_points=100, viz_callback=False,
                  show_status=False, max_num_improvement_loops=0,
                  min_ess=0, dlogz=2.0, frac_remain=0.1)


def test_resume_refuses_changed_likelihood():
    tmp = tempfile.mkdtemp()
    try:
        sampler = ReactiveNestedSampler(
            ['a', 'b'], loglike_a, transform=transform, vectorized=True,
            log_dir=tmp, resume=True, seed=1)
        sampler.run(**RUN_KWARGS)
        sampler.pointstore.close()

        with pytest.raises(Exception, match="resume"):
            ReactiveNestedSampler(
                ['a', 'b'], loglike_b, transform=transform, vectorized=True,
                log_dir=tmp, resume=True, seed=2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_resume_similar_salvages_points():
    tmp = tempfile.mkdtemp()
    try:
        sampler = ReactiveNestedSampler(
            ['a', 'b'], loglike_a, transform=transform, vectorized=True,
            log_dir=tmp, resume=True, seed=3)
        res1 = sampler.run(**RUN_KWARGS)
        sampler.pointstore.close()

        ncalls = {'n': 0}

        def counting_loglike_b(theta):
            ncalls['n'] += len(theta)
            return loglike_b(theta)

        sampler2 = ReactiveNestedSampler(
            ['a', 'b'], counting_loglike_b, transform=transform,
            vectorized=True, log_dir=tmp, resume='resume-similar',
            warmstart_max_tau=0.3, seed=4)
        res2 = sampler2.run(**RUN_KWARGS)
        # salvage should reuse a substantial part of the stored run
        assert ncalls['n'] < 3 * res1['ncall'], (ncalls['n'], res1['ncall'])
        expected = np.log(2 * np.pi * 0.11**2)
        assert abs(res2['logz'] - expected) < 1.5, (res2['logz'], expected)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_warmstart_from_similar_file():
    tmp = tempfile.mkdtemp()
    try:
        sampler = ReactiveNestedSampler(
            ['a', 'b'], loglike_a, transform=transform, vectorized=True,
            log_dir=tmp, resume=True, seed=5)
        sampler.run(**RUN_KWARGS)
        sampler.pointstore.close()
        usample_file = os.path.join(
            sampler.logs['chains'], 'weighted_post_untransformed.txt')
        assert os.path.exists(usample_file)

        aux_names, aux_loglike, aux_transform, vectorized = \
            warmstart_from_similar_file(
                usample_file, ['a', 'b'], loglike_b, transform,
                vectorized=True)
        assert aux_names == ['a', 'b', 'aux_logweight']
        assert vectorized

        sampler2 = ReactiveNestedSampler(
            aux_names, aux_loglike, transform=aux_transform,
            vectorized=True, seed=6)
        res = sampler2.run(min_num_live_points=100, viz_callback=False,
                           show_status=False, max_num_improvement_loops=0,
                           min_ess=0, dlogz=2.0, frac_remain=0.1)
        expected = np.log(2 * np.pi * 0.11**2)
        assert abs(res['logz'] - expected) < 1.5, (res['logz'], expected)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_warmstart_missing_file_warns():
    with pytest.warns(UserWarning, match='not hot-resuming'):
        names, ll, tr, vec = warmstart_from_similar_file(
            '/nonexistent/file.txt', ['a', 'b'], loglike_b, transform,
            vectorized=True)
    assert names == ['a', 'b']
