"""Finite-difference gradient checking (the analogue of torch gradcheck
used across mmcv's op tests, reference: mmcv/tests/test_ops/test_roi_align.py:41-64)."""

import numpy as np
import jax
import jax.numpy as jnp


def check_grad(f, args, eps=1e-3, atol=1e-2, n_probe=3, seed=0):
    """Compare reverse-mode grads of scalar f against central differences
    along random probe directions."""
    grads = jax.grad(f, argnums=tuple(range(len(args))))(*args)
    rng = np.random.default_rng(seed)
    for i, (a, g) in enumerate(zip(args, grads)):
        a_np = np.asarray(a, np.float64)
        g_np = np.asarray(g, np.float64)
        for _ in range(n_probe):
            d = rng.standard_normal(a_np.shape)
            d /= np.linalg.norm(d.ravel()) + 1e-12
            args_p = list(args); args_m = list(args)
            args_p[i] = jnp.asarray(a_np + eps * d, a.dtype)
            args_m[i] = jnp.asarray(a_np - eps * d, a.dtype)
            fd = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
            an = float(np.sum(g_np * d))
            assert abs(fd - an) <= atol * max(1.0, abs(fd)), (
                f'arg {i}: finite-diff {fd} vs analytic {an}')
