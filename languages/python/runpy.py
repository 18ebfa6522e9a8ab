"""Plain-python (non-vectorized) likelihood example."""
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))

from ultranest_tpu import ReactiveNestedSampler  # noqa: E402


def my_likelihood(params):
    """Single-point likelihood (automatically vectorized by the sampler)."""
    return -0.5 * (((params - 0.5) / 0.1) ** 2).sum()


def my_prior_transform(cube):
    """Single-point prior transform."""
    return cube


if __name__ == '__main__':
    paramnames = ["a", "b", "c"]
    sampler = ReactiveNestedSampler(paramnames, my_likelihood,
                                    transform=my_prior_transform)
    sampler.run(min_num_live_points=200, viz_callback=False)
    sampler.print_results()
