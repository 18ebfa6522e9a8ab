.PHONY: test test-fast bench fuzz shrinkage release-test test-distributed tutorials clean

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
# shrinkage sweeps, language bindings, multi-controller full runs
release-test: test shrinkage test-distributed
	python examples/testfeatures.py --random --seed 2 --nrounds 25
	$(MAKE) -C languages/c
	$(MAKE) -C languages/c++

# the analogue of the reference's `mpiexec -np 5` release gate
# (/root/reference/Makefile:103-107): ReactiveNestedSampler.run()
# executes to completion on 2 gloo-connected controllers sharing one
# jax mesh, asserting identical logz/ncall digests on both. To run a
# script of your own the same way:
#   ULTRANEST_TPU_COORDINATOR=localhost:9911 ULTRANEST_TPU_NPROC=2 \
#     ULTRANEST_TPU_PROCID=<0|1> python yourscript.py   (one per process;
#   mpiexec -n 2 works too — OMPI_COMM_WORLD_* env vars are honored)
# with yourscript.py calling parallel.launch.init_distributed() and
# passing mesh=launch.global_mesh() to ReactiveNestedSampler.
test-distributed:
	python -m pytest tests/test_distributed.py -q

clean:
	rm -rf .jax_cache testfeatures logs
	find . -name __pycache__ -type d -exec rm -rf {} +

tutorials:
	ULTRANEST_TUTORIAL_QUICK=1 python examples/tutorial_linefit.py
	ULTRANEST_TUTORIAL_QUICK=1 python examples/tutorial_sine_modelcomparison.py
	ULTRANEST_TUTORIAL_QUICK=1 python examples/tutorial_sine_bayesian_workflow.py
