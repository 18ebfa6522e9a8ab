"""Profile the eggbox headline on the default backend.

Runs bench.run_eggbox once to warm jit caches, then again under
cProfile; dumps stats to /tmp/eggbox.prof for offline analysis.
"""
import cProfile
import pstats
import sys

sys.path.insert(0, '.')
import bench  # noqa: E402

jax = bench._configure_jax(None)
on_tpu = jax.default_backend() != 'cpu'
print('backend:', jax.default_backend())

row = bench.run_eggbox(on_tpu, seed=7)
print('warm run:', row)
row = bench.run_eggbox(on_tpu, seed=42)
print('warm run 2:', row)

prof = cProfile.Profile()
prof.enable()
row = bench.run_eggbox(on_tpu, seed=42)
prof.disable()
print('profiled run:', row)
prof.dump_stats('/tmp/eggbox.prof')
stats = pstats.Stats(prof)
stats.sort_stats('cumulative').print_stats(25)
