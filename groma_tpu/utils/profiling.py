"""Profiling / timing harness.

TPU replacement for the reference's CUDA-event timers and torch.profiler
hooks (reference: mmdet/utils/profiling.py:10-40 profile_time,
mmcv/mmcv/runner/hooks/profiler.py:12 ProfilerHook): jax.profiler traces +
block_until_ready wall timing.

``time_fn_ingraph`` repeats the workload inside one compiled program
(lax.fori_loop with per-iteration input perturbation) so measurements are
pure device time — immune to host->device transfer costs and to result
caching in remote-execution tunnels.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_time(name: str, log=print):
    """Wall-clock scope timer (host side)."""
    t0 = time.perf_counter()
    yield
    log(f'[{name}] {time.perf_counter() - t0:.4f}s')


def trace(log_dir: str):
    """jax.profiler trace context (TensorBoard-viewable)."""
    return jax.profiler.trace(log_dir)


def time_fn_ingraph(fn: Callable, args: tuple, iters: int = 10,
                    perturb_arg: int = 0) -> float:
    """Seconds per iteration of ``fn(*args)``, measured by running all
    iterations inside a single jit program.

    ``perturb_arg`` selects which positional arg gets a tiny per-iteration
    additive perturbation to defeat any value-level caching; the perturbed
    arg must contain at least one float array.  EVERY floating leaf of
    that arg is perturbed: perturbing only one leaf leaves any compute
    consuming the others loop-INVARIANT, and XLA hoists it out of the
    fori_loop — a multi-matmul probe then times 1 of its N matmuls (this
    exact bug made exp_decode_matmul_m8 read 5 TB/s of phantom weight
    bandwidth in round 4).
    """
    @jax.jit
    def run(seed, *a):
        def body(i, carry):
            args_i = list(a)
            leaves, treedef = jax.tree_util.tree_flatten(
                args_i[perturb_arg])
            for k, leaf in enumerate(leaves):
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    leaves[k] = leaf + ((i + seed).astype(leaf.dtype)
                                        * 1e-12)
            args_i[perturb_arg] = jax.tree_util.tree_unflatten(
                treedef, leaves)
            out = fn(*args_i)
            # fold the output into a scalar so nothing is dead code
            acc = carry
            for leaf in jax.tree_util.tree_leaves(out):
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-12
            return acc

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    # compile/warmup with seed 0; timed run uses a different seed so a
    # caching execution relay cannot replay the warmup result.  NOTE:
    # fetch the scalar result (not just block_until_ready) — remote
    # execution backends may treat block_until_ready as a no-op.
    float(run(jnp.int32(0), *args))
    t0 = time.perf_counter()
    float(run(jnp.int32(1), *args))
    return (time.perf_counter() - t0) / iters
