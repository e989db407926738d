"""Linear assignment (Hungarian) backends for the set matcher.

Two implementations:

* ``solve_lap_host`` — exact scipy linear_sum_assignment via
  ``jax.pure_callback`` (vmappable); the parity oracle and the default.
* ``solve_lap_auction`` — on-device forward auction with epsilon scaling,
  fully jittable (no host round-trip), for pipelines where callbacks are
  undesirable (e.g. heavily sharded training).  Near-optimal: with eps
  below 1/n the assignment is optimal for integer-scaled costs; for float
  costs it is within n*eps of optimal, which empirically reproduces scipy
  on DETR-style cost matrices.

Both take a padded rectangular cost matrix (Q, M) and a valid-column count
``m``; they return, per query row, the assigned column or -1.  Every valid
column is assigned (Q >= M case, matching the reference's
scipy.linear_sum_assignment usage in matcher.py:95-112).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e9


def _scipy_solve(cost: np.ndarray, m: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    q = cost.shape[0]
    m = int(m)
    out = np.full(q, -1, np.int32)
    if m > 0:
        rows, cols = linear_sum_assignment(cost[:, :m])
        out[rows] = cols.astype(np.int32)
    return out


def solve_lap_host(cost: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """(Q, M_max) float cost, scalar valid-column count -> (Q,) assignment."""
    q = cost.shape[0]
    return jax.pure_callback(
        _scipy_solve,
        jax.ShapeDtypeStruct((q,), jnp.int32),
        cost, m,
        vmap_method="sequential")


@jax.jit
def solve_lap_jv(cost: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Exact Hungarian via shortest augmenting paths (Jonker-Volgenant
    style, the classical O(n^3) potentials formulation), fully on device.

    One augmentation per valid column: a dense Dijkstra over rows with
    reduced costs, then potential updates and path flipping.  All loops are
    lax control flow with fixed-size state; the inner Dijkstra exits as
    soon as it pops an unassigned row, so sequential trip counts track the
    actual contention instead of a worst-case round budget (the epsilon-
    scaled auction burns ~10x200 rounds re-assigning its dummy columns).
    Exact: matches scipy.linear_sum_assignment total cost to fp rounding.
    """
    q, mmax = cost.shape
    c = cost.T.astype(jnp.float32)                  # (M, Q) person x object
    inf = jnp.float32(jnp.inf)

    def augment(i, carry):
        u, v, p = carry    # u (M,) person potentials; v (Q,); p (Q,) -> person

        def do(carry):
            u, v, p = carry
            minv = c[i] - u[i] - v                  # (Q,)
            way = jnp.full(q, -1, jnp.int32)
            used = jnp.zeros(q, bool)

            def cond(st):
                return ~st[6]

            def body(st):
                u, v, p, minv, way, used, done, j_end = st
                mv = jnp.where(used, inf, minv)
                j1 = jnp.argmin(mv).astype(jnp.int32)
                delta = mv[j1]
                # potentials: virtual start column keeps u[i] in every step
                u_pad = jnp.concatenate([u, jnp.zeros(1, u.dtype)])
                owners = jnp.where(used, p, mmax)
                u_pad = u_pad.at[owners].add(
                    jnp.where(used, delta, 0.0))
                u = u_pad[:mmax].at[i].add(delta)
                v = jnp.where(used, v - delta, v)
                minv = jnp.where(used, minv, minv - delta)
                used = used.at[j1].set(True)
                done = p[j1] < 0
                # extend the search tree through j1's current person
                i2 = jnp.maximum(p[j1], 0)
                cur = c[i2] - u[i2] - v
                better = (cur < minv) & ~used & ~done
                minv = jnp.where(better, cur, minv)
                way = jnp.where(better, j1, way)
                return u, v, p, minv, way, used, done, j1

            u, v, p, minv, way, used, _, j_end = jax.lax.while_loop(
                cond, body,
                (u, v, p, minv, way, used, jnp.bool_(False),
                 jnp.int32(-1)))

            # flip the augmenting path back to the tree root
            def flip_cond(st):
                return st[0] >= 0

            def flip(st):
                j, p = st
                jprev = way[j]
                newp = jnp.where(jprev < 0, i, p[jnp.maximum(jprev, 0)])
                return jprev, p.at[j].set(newp)

            _, p = jax.lax.while_loop(flip_cond, flip, (j_end, p))
            return u, v, p

        return jax.lax.cond(i < m, do, lambda car: car, (u, v, p))

    u = jnp.zeros(mmax, jnp.float32)
    v = jnp.zeros(q, jnp.float32)
    p = jnp.full(q, -1, jnp.int32)
    _, _, p = jax.lax.fori_loop(0, mmax, augment, (u, v, p))
    return p


@partial(jax.jit, static_argnames=("num_phases", "rounds_per_phase"))
def solve_lap_auction_fast(cost: jnp.ndarray, m: jnp.ndarray,
                           num_phases: int = 6,
                           rounds_per_phase: int = 100) -> jnp.ndarray:
    """Asymmetric forward auction: only the ``m`` valid COLUMNS bid (for
    rows), no dummy columns.

    The squared formulation (solve_lap_auction) spends most of its rounds
    on bidding wars among the (Q - m) uniform-benefit dummy columns it
    introduces — e.g. ~42 dummies for a DETR group of 50 queries x 8
    targets — which dominates the device while_loop's sequential latency.
    Here each person is a real target; rounds scale with target count and
    contention only.  epsilon-scaled; persons-complete assignments satisfy
    eps-CS, giving total benefit within m*eps_final of optimal — checked
    exactly against scipy on randomized DETR-style matrices in
    tests/test_matcher_criterion.py.
    """
    q, mmax = cost.shape
    benefit = -cost.T                                   # (M, Q) persons x rows
    person_valid = jnp.arange(mmax) < m
    person_ids = jnp.arange(mmax, dtype=jnp.int32)

    spread = jnp.maximum(jnp.max(cost) - jnp.min(cost), 1.0)
    eps_final = spread * 1e-5
    eps0 = spread / 2.0
    shrink = (eps_final / eps0) ** (1.0 / max(num_phases - 1, 1))

    def phase(p, carry):
        prices, _, _ = carry
        eps = eps0 * shrink ** p
        owner = jnp.full(q, -1, jnp.int32)              # row -> person
        assigned = jnp.full(mmax, -1, jnp.int32)        # person -> row

        def cond(state):
            it, _, _, assigned = state
            return (it < rounds_per_phase) & jnp.any(
                (assigned < 0) & person_valid)

        def round_(state):
            it, prices, owner, assigned = state
            unassigned = (assigned < 0) & person_valid
            vals = benefit - prices[None, :]            # (M, Q)
            best = jnp.argmax(vals, axis=1)
            best_val = jnp.max(vals, axis=1)
            vals2 = vals.at[person_ids, best].set(-jnp.inf)
            second_val = jnp.max(vals2, axis=1)
            bid = jnp.take(prices, best) + best_val - second_val + eps

            bids_on = (jax.lax.broadcasted_iota(jnp.int32, (q, mmax), 0)
                       == best[None, :]) & unassigned[None, :]
            bid_mat = jnp.where(bids_on, bid[None, :], -jnp.inf)
            win_val = jnp.max(bid_mat, axis=1)          # (Q,)
            win_person = jnp.argmax(bid_mat, axis=1).astype(jnp.int32)
            has_bid = jnp.isfinite(win_val)

            disp = jnp.any(
                has_bid[:, None] & (owner[:, None] == person_ids[None, :])
                & (win_person[:, None] != person_ids[None, :]), axis=0)
            assigned = jnp.where(disp, -1, assigned)
            rows = jnp.arange(q, dtype=jnp.int32)
            padded = jnp.concatenate([assigned,
                                      jnp.full(1, -1, jnp.int32)])
            idx = jnp.where(has_bid, win_person, mmax)
            padded = padded.at[idx].set(jnp.where(has_bid, rows, -1))
            assigned = padded[:mmax]
            owner = jnp.where(has_bid, win_person, owner)
            prices = jnp.where(has_bid, win_val, prices)
            return it + 1, prices, owner, assigned

        _, prices, owner, assigned = jax.lax.while_loop(
            cond, round_, (0, prices, owner, assigned))
        return prices, owner, assigned

    prices = jnp.zeros(q)
    owner = jnp.full(q, -1, jnp.int32)
    assigned = jnp.full(mmax, -1, jnp.int32)
    prices, owner, assigned = jax.lax.fori_loop(
        0, num_phases, phase, (prices, owner, assigned))

    out = jnp.full(q, -1, jnp.int32)
    rows = jnp.where((assigned >= 0) & person_valid, assigned, q)
    padded = jnp.concatenate([out, jnp.full(1, -1, jnp.int32)])
    padded = padded.at[rows].max(jnp.where(person_valid, person_ids, -1))
    return padded[:q]


@partial(jax.jit, static_argnames=("num_phases", "rounds_per_phase"))
def solve_lap_auction(cost: jnp.ndarray, m: jnp.ndarray,
                      num_phases: int = 10,
                      rounds_per_phase: int = 200) -> jnp.ndarray:
    """Jacobi (parallel-bidding) auction with epsilon scaling.

    All unassigned columns bid simultaneously for their best row; each row
    accepts the highest bid.  Per phase, epsilon shrinks 5x and assignments
    are cleared while prices persist (standard eps-scaling); with final
    eps << spread/n the result matches the optimal assignment on
    DETR-scale (<=550 x 50) matrices.  Everything is fixed-shape; one
    while_loop per phase bounded by ``rounds_per_phase``.
    """
    q, mmax = cost.shape
    # Square the problem: asymmetric forward auction lacks the lambda price
    # floor and can stall far from optimal; with (q - m) constant-benefit
    # dummy columns soaking up the surplus rows, plain eps-scaled auction is
    # optimal within q*eps (Bertsekas).  Dummy/dummy-invalid columns get a
    # uniform 0 benefit so they never affect the real assignment's argmax.
    n = q
    benefit = jnp.zeros((n, q))
    col_valid_in = jnp.arange(mmax) < m
    real = jnp.where(col_valid_in[:, None], -cost.T, 0.0)  # (mmax, q)
    benefit = benefit.at[:mmax].set(real)
    is_real = jnp.concatenate([col_valid_in, jnp.zeros(n - mmax, bool)]) \
        if n > mmax else col_valid_in[:n]
    col_valid = jnp.ones(n, bool)
    col_ids = jnp.arange(n, dtype=jnp.int32)
    mmax_sq = n

    spread = jnp.maximum(jnp.max(cost) - jnp.min(cost), 1.0)
    eps_final = spread * 1e-4
    eps0 = spread / 2.0
    shrink = (eps_final / eps0) ** (1.0 / max(num_phases - 1, 1))

    def phase(p, carry):
        prices, _, _ = carry
        eps = eps0 * shrink ** p
        owner = jnp.full(q, -1, jnp.int32)
        assigned = jnp.full(n, -1, jnp.int32)

        def cond(state):
            it, _, _, assigned = state
            return (it < rounds_per_phase) & jnp.any(
                (assigned < 0) & col_valid)

        def round_(state):
            it, prices, owner, assigned = state
            unassigned = (assigned < 0) & col_valid       # (M,)
            vals = benefit - prices[None, :]              # (M, Q)
            best = jnp.argmax(vals, axis=1)               # (M,)
            best_val = jnp.max(vals, axis=1)
            vals2 = vals.at[col_ids, best].set(-jnp.inf)
            second_val = jnp.max(vals2, axis=1)
            bid = jnp.take(prices, best) + best_val - second_val + eps

            # rows accept the highest bid among bidding columns
            bids_on = (jax.lax.broadcasted_iota(jnp.int32, (q, n), 0)
                       == best[None, :]) & unassigned[None, :]  # (Q, M)
            bid_mat = jnp.where(bids_on, bid[None, :], -jnp.inf)
            win_val = jnp.max(bid_mat, axis=1)            # (Q,)
            win_col = jnp.argmax(bid_mat, axis=1).astype(jnp.int32)
            has_bid = jnp.isfinite(win_val)

            # columns displaced by a new winner lose their row
            disp = jnp.any(has_bid[:, None]
                           & (owner[:, None] == col_ids[None, :])
                           & (win_col[:, None] != col_ids[None, :]), axis=0)
            assigned = jnp.where(disp, -1, assigned)
            # winners take rows (win_col is distinct across bidding rows:
            # each column bids for exactly one row)
            rows = jnp.arange(q, dtype=jnp.int32)
            padded = jnp.concatenate([assigned, jnp.full(1, -1, jnp.int32)])
            idx = jnp.where(has_bid, win_col, n)
            padded = padded.at[idx].set(jnp.where(has_bid, rows, -1))
            assigned = padded[:n]
            owner = jnp.where(has_bid, win_col, owner)
            prices = jnp.where(has_bid, win_val, prices)
            return it + 1, prices, owner, assigned

        _, prices, owner, assigned = jax.lax.while_loop(
            cond, round_, (0, prices, owner, assigned))
        return prices, owner, assigned

    prices = jnp.zeros(q)
    owner = jnp.full(q, -1, jnp.int32)
    assigned = jnp.full(n, -1, jnp.int32)
    prices, owner, assigned = jax.lax.fori_loop(
        0, num_phases, phase, (prices, owner, assigned))

    out = jnp.full(q, -1, jnp.int32)
    rows = jnp.where(assigned >= 0, assigned, 0)
    vals = jnp.where((assigned >= 0) & is_real, col_ids, -1)
    out = out.at[rows].max(vals)
    return out
