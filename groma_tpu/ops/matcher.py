"""Hungarian (bipartite) matching for DETR-style losses.

The reference runs scipy ``linear_sum_assignment`` on the host every step
(reference: groma/model/ddetr_transformer.py:28,236 and the HF
DeformableDetrHungarianMatcher it instantiates at :732).  Two TPU-friendly
paths are provided:

* ``hungarian_match`` — exact LSA via ``jax.pure_callback`` into scipy on
  fixed-capacity padded cost matrices.  The callback is per training step
  and overlaps with device compute; identical optima to the reference.
* ``auction_match`` — fully on-device auction algorithm (jittable,
  fori_loop) for host-free training at scale.  Epsilon-scaled; converges to
  an assignment within ``n * eps`` of optimal, which is exact for the
  integer-scaled costs used here.

Both take a (B, Q, T) cost matrix plus a (B, T) target-validity mask and
return, per target slot, the matched query index (or -1 for padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e9


def _scipy_lsa_batch(cost: np.ndarray, tgt_valid: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment
    b, q, t = cost.shape
    out = np.full((b, t), -1, np.int32)
    for i in range(b):
        nt = int(tgt_valid[i].sum())
        if nt == 0:
            continue
        # valid targets are assumed packed at the front (collator contract)
        rows, cols = linear_sum_assignment(cost[i, :, :nt])
        out[i, cols] = rows.astype(np.int32)
    return out


def hungarian_match(cost: jnp.ndarray, tgt_valid: jnp.ndarray) -> jnp.ndarray:
    """Exact Hungarian matching through a host callback.

    Args:
      cost: (B, Q, T) float cost matrix (T = padded target capacity).
      tgt_valid: (B, T) bool, valid targets packed at the front.

    Returns:
      (B, T) int32: matched query index per target, -1 on padding.
    """
    b, q, t = cost.shape
    cost = jnp.nan_to_num(cost.astype(jnp.float32), nan=BIG,
                          posinf=BIG, neginf=-BIG)
    out_shape = jax.ShapeDtypeStruct((b, t), jnp.int32)
    return jax.pure_callback(_scipy_lsa_batch, out_shape, cost, tgt_valid,
                             vmap_method='sequential')


@functools.partial(jax.jit, static_argnames=('num_iters',))
def auction_match(cost: jnp.ndarray, tgt_valid: jnp.ndarray,
                  eps: float = 1e-4, num_iters: int = 2000) -> jnp.ndarray:
    """On-device auction assignment (minimization), batched.

    Classic Bertsekas forward auction on the negated cost ("benefit")
    matrix: every unassigned target bids for its best query with increment
    (best - second_best + eps); highest bid wins the query.  Invalid target
    slots never bid.

    The benefit matrix is NORMALIZED to unit range per instance before
    bidding (the assignment is invariant to positive scaling), so ``eps``
    is a RELATIVE precision and the round count is scale-free.  Without
    this, DETR matching costs (range ~20: focal + L1 + GIoU) made
    eps=1e-4 an effective 5e-6 relative precision — the auction crawled
    through thousands of rounds (~930 ms of a det-pretrain step; ~90 ms
    normalized).  Near-optimality: total cost within T·eps·range of the
    optimum.  (ε-scaling with price carryover is NOT applicable here:
    with Q >> T, unassigned queries keep phase-inflated prices, which
    breaks the ε-CS optimality argument — measured 2-4x worse matchings.)
    """
    b, q, t = cost.shape
    benefit = -jnp.nan_to_num(cost.astype(jnp.float32), nan=BIG,
                              posinf=BIG, neginf=-BIG)    # (B, Q, T)
    benefit = jnp.swapaxes(benefit, 1, 2)                 # (B, T, Q)

    int_max = jnp.iinfo(jnp.int32).max

    def single(ben, valid):
        # ben: (T, Q); valid: (T,)
        # normalization range from FINITE-magnitude entries only: NaN/inf
        # costs were mapped to +/-BIG above, and a single such entry in a
        # valid row would inflate rng_ to ~BIG, collapsing all finite
        # benefit differences below eps (arbitrary matching for that
        # instance).  |ben| >= BIG entries still participate in bidding —
        # they just don't set the scale.
        finite = valid[:, None] & (jnp.abs(ben) < BIG)
        vben = jnp.where(finite, ben, jnp.nan)
        rng_ = jnp.nan_to_num(jnp.nanmax(vben) - jnp.nanmin(vben), nan=0.0)
        ben = ben / jnp.maximum(rng_, 1e-30)
        tgt_ids = jax.lax.broadcasted_iota(jnp.int32, (t,), 0)
        q_ids = jax.lax.broadcasted_iota(jnp.int32, (q,), 0)

        def body(state):
            it, price, owner = state                      # (Q,), (T,)
            values = ben - price[None, :]                 # (T, Q)
            top2_v, top2_i = jax.lax.top_k(values, 2)
            best_q = top2_i[:, 0]
            incr = top2_v[:, 0] - top2_v[:, 1] + eps
            bidding = valid & (owner < 0)
            bid_val = jnp.where(bidding, incr, -jnp.inf)
            # highest bid per query
            best_bid = jnp.full((q,), -jnp.inf).at[best_q].max(
                bid_val, mode='drop')
            # winner per query: lowest target index among max bidders
            cand = bidding & (bid_val >= best_bid[best_q])
            winner = jnp.full((q,), int_max, jnp.int32).at[best_q].min(
                jnp.where(cand, tgt_ids, int_max), mode='drop')
            q_won = winner < int_max
            # release previous owners of re-sold queries
            owner_q = jnp.clip(owner, 0, q - 1)
            release = (owner >= 0) & q_won[owner_q] \
                & (winner[owner_q] != tgt_ids)
            owner = jnp.where(release, -1, owner)
            # winners take ownership (index t is out of range -> dropped)
            idx = jnp.where(q_won, winner, t)
            owner = owner.at[idx].set(q_ids, mode='drop')
            price = price + jnp.where(
                q_won & jnp.isfinite(best_bid), best_bid, 0.0)
            return it + 1, price, owner

        def cond(state):
            it, price, owner = state
            # early exit once every valid target holds a query — a fixed
            # 2000-iteration fori_loop cost ~100 ms per matching at DETR
            # shapes; real instances converge in O(100) rounds.  (Under
            # vmap the loop runs until ALL batch rows converge; the body
            # is a no-op for converged rows.)
            return (it < num_iters) & jnp.any(valid & (owner < 0))

        price0 = jnp.zeros((q,), jnp.float32)
        owner0 = jnp.full((t,), -1, jnp.int32)
        _, _, owner = jax.lax.while_loop(
            cond, body, (jnp.int32(0), price0, owner0))
        return jnp.where(valid, owner, -1)

    return jax.vmap(single)(benefit, tgt_valid)
