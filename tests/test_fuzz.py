"""Replay a handful of fuzzer configurations end-to-end."""
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'examples'))

import testfeatures  # noqa: E402


def _replay(seed, tmp_path):
    random.seed(seed)

    def choose(myargs):
        if random.random() < 0.25:
            return myargs[0]
        return random.choice(myargs)

    runargs = testfeatures.generate_runargs(choose)
    # keep CI runtimes bounded
    runargs['num_live_points'] = min(runargs['num_live_points'], 100)
    runargs['max_ncalls'] = min(runargs['max_ncalls'], 30000.0)
    runargs['x_dim'] = min(runargs['x_dim'], 6)
    runargs['min_ess'] = 0
    runargs['dlogz'] = max(runargs['dlogz'], 1.0)
    runargs['frac_remain'] = max(runargs['frac_remain'], 0.05)
    if runargs['log_dir'] is not None:
        runargs['log_dir'] = str(tmp_path / 'logs')
    print("fuzz config:", runargs)
    testfeatures.main(testfeatures.AttrDict(runargs))


@pytest.mark.parametrize("seed", list(range(25, 37)))
def test_fuzzed_configuration(seed, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _replay(seed, tmp_path)


# full reference-parity replay range (the reference CI replays seeds
# 25..99, /root/reference/.circleci/config.yml:30); slow-marked so the
# quick suite stays bounded
@pytest.mark.slow
@pytest.mark.parametrize("seed", list(range(37, 100)))
def test_fuzzed_configuration_wide(seed, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _replay(seed, tmp_path)
