"""Shared persistent-compile-cache setup for the standalone benchmarks
(bench.py sets this for its own process only; the scripts also run solo)."""
import os


def enable():
    import jax
    try:
        jax.config.update(
            'jax_compilation_cache_dir',
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), '.jax_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass
