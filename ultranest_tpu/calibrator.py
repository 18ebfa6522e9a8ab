# noqa: D400 D205
"""
Calibration of step samplers
----------------------------

Runs a sequence of nested sampling runs with doubling step counts until
log(Z) converges — the recommended procedure for choosing the number of
steps (Higson+19). Rebuild of `/root/reference/ultranest/calibrator.py`.
"""

import os
from collections import deque

import numpy as np

from .integrator import ReactiveNestedSampler

__all__ = ['ReactiveNestedCalibrator']


def _last_item_from_iterator(iterator):
    """Return the last item yielded by *iterator*."""
    return deque(iterator, maxlen=1).pop()


def _substitute_log_dir(init_args, nsteps):
    """Suffix the log_dir argument with the step count, if set."""
    if 'log_dir' in init_args:
        args = dict(init_args)
        args['log_dir'] = init_args['log_dir'] + '-nsteps%d' % nsteps
        return args
    return init_args


class ReactiveNestedCalibrator:
    """Step-count calibrator: drop-in replacement for ReactiveNestedSampler.

    Runs full nested sampling repeatedly with nsteps doubling each time
    (starting at the dimensionality), until three consecutive runs have
    unordered log(Z) values with overlapping error bars.

    Usage::

        sampler = ReactiveNestedCalibrator(paramnames, loglike, transform)
        sampler.stepsampler = SliceSampler(nsteps=10, generate_direction=...)
        sampler.run(min_num_live_points=400)
    """

    def __init__(self, param_names, loglike, transform=None, **kwargs):
        """Store the sampler arguments for the repeated runs.

        If ``log_dir`` is in *kwargs*, each run gets the suffix
        ``-nsteps%d``.
        """
        self.init_args = dict(param_names=param_names, loglike=loglike,
                              transform=transform, **kwargs)
        self.stepsampler = None

    def run_iter(self, **kwargs):
        """Yield (nsteps, result) for each calibration run until convergence.

        Convergence: the last three runs are not monotonically ordered in
        log(Z) and consecutive error bars overlap.
        """
        assert self.stepsampler is not None
        self.run_args = kwargs

        nsteps = len(self.init_args['param_names'])
        self.results = []
        self.nsteps = []
        self.relsteps = []

        while True:
            print("running with %d steps ..." % nsteps)
            init_args = _substitute_log_dir(self.init_args, nsteps)
            sampler = ReactiveNestedSampler(**init_args)
            stepsampler_kwargs = {}
            if hasattr(self.stepsampler, 'check_nsteps'):
                stepsampler_kwargs['check_nsteps'] = self.stepsampler.check_nsteps
            if hasattr(self.stepsampler, 'adaptive_nsteps'):
                stepsampler_kwargs['adaptive_nsteps'] = self.stepsampler.adaptive_nsteps
            if hasattr(self.stepsampler, 'popsize'):
                stepsampler_kwargs['popsize'] = self.stepsampler.popsize
            if 'log_dir' in self.init_args:
                stepsampler_kwargs['log'] = open(  # noqa: SIM115
                    init_args['log_dir'] + '/stepsampler.log', 'w')
            sampler.stepsampler = self.stepsampler.__class__(
                nsteps=nsteps,
                generate_direction=self.stepsampler.generate_direction,
                **stepsampler_kwargs)
            self.sampler = sampler
            result = sampler.run(**self.run_args)
            print("Z=%(logz).2f +- %(logzerr).2f" % result)
            if self.sampler.log_to_disk:
                sampler.stepsampler.plot(os.path.join(
                    self.sampler.logs['plots'], 'stepsampler.pdf'))
                sampler.stepsampler.plot_jump_diagnostic_histogram(
                    os.path.join(self.sampler.logs['plots'],
                                 'stepsampler-jumphist.pdf'),
                    histtype='step', bins='auto')
            sampler.stepsampler.print_diagnostic()
            if hasattr(sampler.stepsampler, 'logstat_labels') and \
                    'jump-distance' in sampler.stepsampler.logstat_labels and \
                    'reference-distance' in sampler.stepsampler.logstat_labels:
                i = sampler.stepsampler.logstat_labels.index('jump-distance')
                j = sampler.stepsampler.logstat_labels.index('reference-distance')
                jump_distances = np.array(
                    [entry[i] for entry in sampler.stepsampler.logstat])
                reference_distances = np.array(
                    [entry[j] for entry in sampler.stepsampler.logstat])
                self.relsteps.append(jump_distances / reference_distances)

            self.results.append(result)
            self.nsteps.append(nsteps)
            yield nsteps, result
            if len(self.results) > 2:
                last_result = self.results[-2]
                last_result2 = self.results[-3]
                last_significant = abs(result['logz'] - last_result['logz']) \
                    > (result['logzerr']**2 + last_result['logzerr']**2)**0.5
                last2_significant = \
                    abs(last_result2['logz'] - last_result['logz']) \
                    > (last_result2['logzerr']**2 + last_result['logzerr']**2)**0.5
                monotonic_increase = result['logz'] > last_result['logz'] \
                    > last_result2['logz']
                monotonic_decrease = result['logz'] < last_result['logz'] \
                    < last_result2['logz']
                if last_significant:
                    print("not converged: last two Z were significantly different")
                elif last2_significant:
                    print("not yet converged: previous two Z were significantly different")
                elif monotonic_increase:
                    print("not converged: monotonic increase in the last three Z results")
                elif monotonic_decrease:
                    print("not converged: monotonic decrease in the last three Z results")
                else:
                    print("converged! nsteps=%d appears safe" % nsteps)
                    break
            nsteps *= 2

    def run(self, **kwargs):
        """Run calibration runs until convergence; returns the last result."""
        _nsteps, result = _last_item_from_iterator(self.run_iter(**kwargs))
        return result

    def plot(self):
        """Store convergence diagnostics plots into the plots folder."""
        self.sampler.stepsampler.plot(os.path.join(
            self.sampler.logs['plots'], 'stepsampler.pdf'))

        calibration_results = []
        import matplotlib.pyplot as plt
        plt.figure("jump-distance")
        print("jump distance diagnostic:")
        for nsteps, relsteps, result in zip(self.nsteps, self.relsteps,
                                            self.results):
            calibration_results.append([
                nsteps, result['logz'], result['logzerr'],
                min(result['niter'],
                    result['insertion_order_MWW_test']['independent_iterations']),
                result['insertion_order_MWW_test']['converged'] * 1,
                np.nanmean(relsteps > 1)])
            plt.hist(np.log10(relsteps + 1e-10), histtype='step', bins='auto',
                     label=nsteps)
            print('  %-4d: %.2f%%  avg:%.2f' % (
                nsteps, np.nanmean(relsteps > 1) * 100.0,
                np.exp(np.nanmean(np.log(relsteps)))))
        if 'log_dir' in self.init_args:
            np.savetxt(
                self.init_args['log_dir'] + 'calibration.csv',
                calibration_results, delimiter=',', comments='',
                header='nsteps,logz,logzerr,maxUrun,Uconverged,stepfrac',
                fmt='%d,%.3f,%.3f,%d,%d,%.5f')
        plt.xlabel('$log_{10}$(relative step distance)')
        plt.ylabel('Frequency')
        plt.legend(title='nsteps', loc='best')
        if self.sampler.log_to_disk:
            plt.savefig(os.path.join(self.sampler.logs['plots'],
                                     'nsteps-calibration-jumps.pdf'),
                        bbox_inches='tight')
            plt.close()

        plt.figure("logz")
        plt.errorbar(
            x=self.nsteps,
            y=[result['logz'] for result in self.results],
            yerr=[result['logzerr'] for result in self.results])
        plt.title('Step sampler calibration')
        plt.xlabel('Number of steps')
        plt.ylabel('ln(Z)')
        if self.sampler.log_to_disk:
            plt.savefig(os.path.join(self.sampler.logs['plots'],
                                     'nsteps-calibration.pdf'),
                        bbox_inches='tight')
            plt.close()
