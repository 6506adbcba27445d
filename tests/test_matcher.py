import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from groma_tpu.ops.matcher import hungarian_match, auction_match


def _case(rng, b=3, q=20, tmax=8, nts=(5, 8, 0)):
    cost = rng.uniform(0, 1, size=(b, q, tmax)).astype(np.float32)
    valid = np.zeros((b, tmax), bool)
    for i, nt in enumerate(nts):
        valid[i, :nt] = True
    return cost, valid


def _total(cost, assign, valid):
    tot = 0.0
    for i in range(cost.shape[0]):
        for t in range(cost.shape[2]):
            if valid[i, t]:
                assert assign[i, t] >= 0
                tot += cost[i, assign[i, t], t]
    return tot


def test_hungarian_matches_scipy(rng):
    cost, valid = _case(rng)
    got = np.asarray(hungarian_match(jnp.asarray(cost), jnp.asarray(valid)))
    for i in range(3):
        nt = valid[i].sum()
        if nt == 0:
            assert (got[i] == -1).all()
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :nt])
        want = np.full(cost.shape[2], -1, np.int32)
        want[cols] = rows
        np.testing.assert_array_equal(got[i], want)


def test_auction_near_optimal(rng):
    cost, valid = _case(rng, b=4, q=30, tmax=10, nts=(10, 7, 1, 0))
    got = np.asarray(auction_match(jnp.asarray(cost), jnp.asarray(valid),
                                   eps=1e-4, num_iters=3000))
    # assignments are a valid matching
    for i in range(4):
        used = got[i][valid[i]]
        assert len(set(used.tolist())) == valid[i].sum()
    # and total cost is within tmax*eps of the scipy optimum
    opt = np.asarray(hungarian_match(jnp.asarray(cost), jnp.asarray(valid)))
    got_tot = _total(cost, got, valid)
    opt_tot = _total(cost, opt, valid)
    assert got_tot <= opt_tot + 10 * 1e-4 + 1e-5
