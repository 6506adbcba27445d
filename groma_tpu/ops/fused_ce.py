"""Fused (chunked-remat) cross-entropy over large vocabularies.

The plain CE path materializes the full-vocabulary logits twice in HBM
— (B, S, V) fp32 from log_softmax and again for its backward — which at
7B scale (V=32114, S=2048) is ~0.5 GB per tensor of pure bandwidth.
The MXU work (hidden @ head) is 4% of a 32-layer step's FLOPs, but the
softmax bandwidth makes the block ~2x its FLOP share of step time
(reference workload: scripts/vl_finetune.sh CE over grounded streams;
loss math: groma/model/groma.py:404-415).

This op never materializes (B, S, V): it scans over sequence chunks,
computes the chunk's logits with fp32 accumulation, reduces them to
logsumexp + gold-logit immediately, and rematerializes the chunk logits
in the backward pass (jax.checkpoint) where the (softmax - onehot)
cotangent is also formed chunk-locally.  Extra cost: one recompute of
the head matmul (+2BSHV FLOPs); saved: every full-vocab HBM round trip.

Numerics: identical math to log_softmax + gather (nll = lse - gold) in
fp32; equality asserted in tests/test_fused_ce.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def fused_cross_entropy(hidden: jnp.ndarray,
                        heads: Sequence[jnp.ndarray],
                        labels: jnp.ndarray,
                        ok: jnp.ndarray,
                        chunk: int = 256,
                        unroll: bool = False) -> jnp.ndarray:
    """Mean NLL of ``labels`` under softmax(concat_i(hidden @ heads[i])).

    hidden: (B, S, H) — already gathered to the conditioning positions.
    heads:  list of (H, Vi) projection matrices (Groma's dual lm head,
            reference: groma/model/groma.py:399-402); labels index the
            concatenated [0, sum Vi) vocabulary.
    labels: (B, S) int32; ok: (B, S) bool — positions entering the mean.
    """
    b, s, h = hidden.shape
    pad = (-s) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)))
        ok = jnp.pad(ok, ((0, 0), (0, pad)))
    nc = (s + pad) // chunk
    hs = hidden.reshape(b, nc, chunk, h).transpose(1, 0, 2, 3)
    ls = jnp.where(ok, labels, 0).reshape(b, nc, chunk).transpose(1, 0, 2)
    os_ = ok.reshape(b, nc, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_nll(h_c, l_c, o_c):
        # fp32-accumulated logits for one (B, chunk) slab only
        logits = jnp.concatenate(
            [jnp.einsum('bch,hv->bcv', h_c, w.astype(h_c.dtype),
                        preferred_element_type=jnp.float32)
             for w in heads], axis=-1)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, l_c[..., None], -1)[..., 0]
        return jnp.sum(jnp.where(o_c, lse - gold, 0.0))

    if unroll:
        # python loop: XLA sees all chunk matmuls at once and can
        # pipeline them (the scan serializes chunk k+1 behind chunk k)
        total = jnp.zeros((), jnp.float32)
        for c in range(nc):
            total = total + chunk_nll(hs[c], ls[c], os_[c])
    else:
        def body(acc, xs):
            return acc + chunk_nll(*xs), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                (hs, ls, os_))
    return total / jnp.maximum(jnp.sum(ok), 1)
