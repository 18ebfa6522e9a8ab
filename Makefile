.PHONY: test test-fast bench fuzz shrinkage release-test clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

fuzz:
	python examples/testfeatures.py --random --seed 1 --nrounds 10

shrinkage:
	python evaluate/evaluate_sampling.py --problem circgauss --x_dim 4 \
		--nlive 100 --nsteps 500 --sampler regionslice
	python evaluate/evaluate_sampling.py --problem pyramid --x_dim 2 \
		--nlive 100 --nsteps 500 --sampler regionball

viz-sampling:
	cd evaluate && python viz_sampling.py --problem circgauss --sampler regionslice
	cd evaluate && python viz_sampling.py --problem pyramid --sampler mh

# extended validation before a release: full tests, wide fuzzing,
# shrinkage sweeps, language bindings
release-test: test shrinkage
	python examples/testfeatures.py --random --seed 2 --nrounds 25
	$(MAKE) -C languages/c
	$(MAKE) -C languages/c++

clean:
	rm -rf .jax_cache testfeatures logs
	find . -name __pycache__ -type d -exec rm -rf {} +
