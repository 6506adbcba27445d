"""Prompt-lookup speculative decoding (draft-model-free).

Decode is weight-stream-bound at B=1 (ROADMAP: int8 10.2 ms/step vs an
8.2 ms HBM floor), so verifying G+1 tokens in ONE forward costs about
the same as emitting one token — if a cheap proposer guesses the next
G tokens, accepted tokens are (G+1)-for-the-price-of-1.  Grounded-QA
answers echo the prompt heavily ("the red object ..." -> "<p>the red
object</p> <roi> <rK>"), so the proposer is PROMPT LOOKUP (n-gram
suffix match against prompt+generated context) — no draft model, no
extra weights.  Greedy outputs are EXACTLY the sequential greedy
outputs (the classic speculative-decoding guarantee specialized to
argmax verification; asserted in tests/test_speculative.py).

TPU-first design: the verify step is one fixed-shape jitted program —
a (1, G+1) chunked-append forward (models/llama_quant.py chunked=True),
in-graph accept-count (cumprod of draft/greedy agreement), and an exact
cache rewind that masks out the speculated-but-rejected KV writes
(their slots are overwritten by the next append).  Only the n-gram
proposal runs on host (pure list ops).

This goes beyond the reference (no speculative decoding upstream); the
verified semantics are the reference's greedy generate
(groma/serve/model_worker.py argmax loop).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from groma_tpu.models.llama_quant import quant_llama_forward


def propose_prompt_lookup(context: Sequence[int], G: int,
                          ngram: int = 2) -> List[int]:
    """Draft G tokens: find the most recent earlier occurrence of the
    context's trailing ``ngram`` and propose what followed it; pad/fall
    back with the last token (a wrong draft costs nothing — the verify
    forward replaces the single-token step either way)."""
    ctx = list(context)
    if len(ctx) >= ngram + 1:
        key = ctx[-ngram:]
        for i in range(len(ctx) - ngram - 1, -1, -1):
            if ctx[i:i + ngram] == key:
                cont = ctx[i + ngram:i + ngram + G]
                if cont:
                    return (cont + [ctx[-1]] * G)[:G]
    return [ctx[-1]] * G


def make_verify_step(cfg_llm, embed_fn, logits_fn, G: int):
    """Build the jitted verify program.

    verify(qp, cache, cur, draft, pos0) feeds [cur, d_1..d_G] through a
    chunked-append forward and returns
      (cache, emitted (G+1,), n_accept, new_cur, new_pos0)
    where emitted[:n_accept+1] are exactly the next sequential-greedy
    tokens (g_0..g_a; positions > a are padded with g_a)."""

    @functools.partial(jax.jit, donate_argnums=(1,))
    def verify(qp, cache, cur, draft, pos0):
        toks = jnp.concatenate([cur, draft])[None]          # (1, G+1)
        emb = embed_fn(qp, toks)
        positions = pos0[:, None] + jnp.arange(G + 1)[None]
        index0 = cache['index']
        hidden, cache = quant_llama_forward(
            qp, cfg_llm, emb, jnp.ones((1, G + 1), bool), positions,
            cache, chunked=True)
        logits = logits_fn(qp, hidden)[0]                   # (G+1, V)
        greedy = jnp.argmax(logits, -1).astype(jnp.int32)
        match = (greedy[:-1] == draft).astype(jnp.int32)    # (G,)
        n_accept = jnp.sum(jnp.cumprod(match))              # 0..G
        idx = jnp.minimum(jnp.arange(G + 1), n_accept)
        emitted = greedy[idx]                               # pad with g_a
        # exact rewind: keep [cur, d_1..d_a] in the cache; the
        # speculated-but-rejected writes are masked out (and overwritten
        # by the next append at the rewound index)
        keep = index0 + 1 + n_accept
        wrote_end = index0 + 1 + G
        iota = jnp.arange(cache['mask'].shape[1])[None]
        cache = {**cache,
                 'mask': jnp.where((iota >= keep) & (iota < wrote_end),
                                   False, cache['mask']),
                 'index': keep}
        new_cur = greedy[n_accept][None]
        return cache, emitted, n_accept, new_cur, pos0 + n_accept + 1

    return verify


def speculative_greedy_decode(verify, qp, cache, cur: int, pos0: int,
                              context: List[int], max_new: int,
                              eos_id: int, G: int, ngram: int = 2,
                              proposer=None):
    """Host loop: propose -> verify -> accept until max_new/EOS.

    ``context`` seeds the lookup with the prompt's (valid) token ids;
    emitted tokens are appended so later drafts can match generated
    text too.  Returns (tokens, stats) — stats carries the acceptance
    telemetry (accepted per verify call)."""
    out: List[int] = [cur]
    context = list(context) + [cur]
    cur_j = jnp.asarray([cur], jnp.int32)
    pos_j = jnp.asarray([pos0], jnp.int32)
    accepts: List[int] = []
    proposer = proposer or propose_prompt_lookup
    while len(out) < max_new and out[-1] != eos_id:
        draft = jnp.asarray(proposer(context, G, ngram), jnp.int32)
        cache, emitted, n_acc, cur_j, pos_j = verify(
            qp, cache, cur_j, draft, pos_j)
        n_acc = int(n_acc)
        accepts.append(n_acc)
        new = [int(t) for t in np.asarray(emitted[:n_acc + 1])]
        for t in new:
            out.append(t)
            context.append(t)
            if t == eos_id or len(out) >= max_new:
                break
    stats = {'verify_calls': len(accepts),
             'accepted': accepts,
             'tokens_per_call': round(len(out[1:]) / max(len(accepts), 1),
                                      2)}
    return out, stats
