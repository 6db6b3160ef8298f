"""Rectangular linear assignment, jit-compatible.

The reference runs ``scipy.optimize.linear_sum_assignment`` on the CPU once
per decoder layer per image inside the training forward pass (reference:
connectomics/model/loss/matcher.py:154-156 called from
mask2former_transformer_decoder.py:548,603) — ten device syncs per step and
the single worst launch-pipeline stall in the reference design.  Here the
solver is the classic shortest-augmenting-path (Jonker-Volgenant) algorithm
written with ``lax`` control flow so it runs *inside* jit on device, can be
vmapped over the batch and over decoder layers, and never leaves the TPU.

``solve_lap(cost)`` takes a [R, C] cost matrix with R <= C and returns, for
every row, the assigned column, minimizing total cost over all R disjoint
assignments — the same matching scipy produces (ties may resolve
differently; any optimum is a valid Hungarian match).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.inf


def solve_lap(cost: jnp.ndarray) -> jnp.ndarray:
    """Assign each row of ``cost`` [R, C] (R <= C) a distinct column.

    Returns ``col4row`` int32 [R].  Differentiation is not supported (use
    ``stop_gradient`` upstream; matching is a discrete decision).
    """
    R, C = cost.shape
    assert R <= C, f"solve_lap requires rows <= cols, got {cost.shape}"
    # Sanitize: NaN costs would otherwise break Dijkstra's comparisons and the
    # termination argument below; a bounded, deterministic wrong answer on a
    # poisoned input beats an unbounded loop (the train step would hang the
    # whole program; round-1 CI "hang" was exactly this on NaN gradients).
    cost = jnp.nan_to_num(cost.astype(jnp.float32), nan=0.0, posinf=1e30, neginf=-1e30)

    def assign_one_row(cur_row, state):
        u, v, col4row, row4col = state

        # --- Dijkstra over columns from cur_row --------------------------
        # Each iteration marks one more column SC=True, so <= C iterations
        # suffice; the explicit bound makes non-termination impossible.
        def dij_cond(c):
            return (c["sink"] < 0) & (c["it"] < C + 1)

        def dij_body(c):
            i = c["i"]
            sr = c["SR"].at[i].set(True)
            reduced = c["minVal"] + cost[i] - u[i] - v
            upd = (~c["SC"]) & (reduced < c["shortest"])
            shortest = jnp.where(upd, reduced, c["shortest"])
            path = jnp.where(upd, i, c["path"])
            masked = jnp.where(c["SC"], _INF, shortest)
            j0 = jnp.argmin(masked)
            min_val = masked[j0]
            # tie-break toward an UNASSIGNED column: any tie-minimal column
            # is a valid Dijkstra extraction, and an unassigned one ends the
            # search immediately.  Without this, the zero-cost padding rows
            # (match_padded zeroes invalid GT slots) tie with the columns
            # earlier padding rows already took and argmin walks that chain
            # — measured 45-55 iterations per padding row (quadratic) vs 1.
            cand = jnp.where((row4col < 0) & (masked == min_val),
                             jnp.arange(C), C + 1)
            j_un = jnp.min(cand)
            j = jnp.where(j_un <= C, j_un, j0).astype(jnp.int32)
            sc = c["SC"].at[j].set(True)
            unassigned = row4col[j] < 0
            return dict(
                c,
                SR=sr,
                SC=sc,
                shortest=shortest,
                path=path,
                minVal=min_val,
                sink=jnp.where(unassigned, j, -1),
                i=row4col[j],
                it=c["it"] + 1,
            )

        init = dict(
            SR=jnp.zeros(R, bool),
            SC=jnp.zeros(C, bool),
            shortest=jnp.full(C, _INF, jnp.float32),
            path=jnp.full(C, -1, jnp.int32),
            minVal=jnp.float32(0.0),
            sink=jnp.int32(-1),
            i=cur_row,
            it=jnp.int32(0),
        )
        fin = jax.lax.while_loop(dij_cond, dij_body, init)
        min_val, shortest, path, SR, SC, sink = (
            fin["minVal"], fin["shortest"], fin["path"], fin["SR"], fin["SC"], fin["sink"],
        )

        # --- dual updates -------------------------------------------------
        u = u.at[cur_row].add(min_val)
        others = SR & (jnp.arange(R) != cur_row)
        # rows in SR other than cur_row are already assigned: col4row[i] >= 0
        delta_r = min_val - shortest[jnp.clip(col4row, 0, C - 1)]
        u = u + jnp.where(others, delta_r, 0.0)
        v = v - jnp.where(SC, min_val - shortest, 0.0)

        # --- augment along the alternating path ---------------------------
        # The alternating path alternates between distinct rows, so <= R + 1
        # iterations; the bound plus the sink >= 0 guard keep this loop finite
        # even if Dijkstra was cut short on a degenerate cost matrix.
        def aug_cond(c):
            return (~c["done"]) & (c["it"] < R + 1)

        def aug_body(c):
            j = c["j"]
            i = path[j]
            r4c = c["row4col"].at[j].set(i)
            nxt = c["col4row"][i]
            c4r = c["col4row"].at[i].set(j)
            return dict(j=nxt, col4row=c4r, row4col=r4c,
                        done=(i == cur_row) | (i < 0), it=c["it"] + 1)

        aug = jax.lax.while_loop(
            aug_cond,
            aug_body,
            dict(j=sink, col4row=col4row, row4col=row4col,
                 done=(sink < 0), it=jnp.int32(0)),
        )
        return u, v, aug["col4row"], aug["row4col"]

    u0 = jnp.zeros(R, jnp.float32)
    v0 = jnp.zeros(C, jnp.float32)
    c4r0 = jnp.full(R, -1, jnp.int32)
    r4c0 = jnp.full(C, -1, jnp.int32)
    _, _, col4row, _ = jax.lax.fori_loop(0, R, assign_one_row, (u0, v0, c4r0, r4c0))
    return col4row


def solve_lap_auction(cost: jnp.ndarray, phases: int = 7,
                      iters_per_phase: int = 200) -> jnp.ndarray:
    """Jacobi auction assignment (Bertsekas) — few wide iterations.

    An alternative to the Jonker-Volgenant solver above: ALL unassigned
    rows bid simultaneously each iteration, so per iteration the work is a
    dense [R, C] VPU pass.  NOTE (measured, v5e): at the matcher's shapes
    the *vmapped JV* is 17-50x faster — its while loops batch across the
    L*B lanes and the per-solve iteration count is small.  The auction's
    epsilon-scaling phases add sequential iterations that do not amortize
    at [100, 40]; it becomes interesting only for much larger R*C.

    epsilon-scaling: ``phases`` rounds with eps shrinking geometrically to
    ``span * 4e-6``; the final assignment is within ``R * eps_final`` of
    optimal, which matches scipy except on ties closer than that (ties are
    solver-defined in scipy too).  Any rows still unassigned when the
    iteration cap trips (pathological bidding wars on exact ties) fall back
    to a greedy masked argmin, keeping every input terminating and every
    output a valid permutation.

    cost: [R, C] with R <= C.  Returns col4row int32 [R].
    """
    R0, C = cost.shape
    assert R0 <= C
    cost = jnp.nan_to_num(cost.astype(jnp.float32), nan=0.0, posinf=1e30,
                          neginf=-1e30)
    # Pad to square with constant-zero dummy rows: epsilon-scaling keeps
    # prices across phases, which is only epsilon-optimal when EVERY column
    # ends up assigned (otherwise unassigned columns retain inflated prices
    # and repel rows).  Zero-cost dummies absorb the leftover columns
    # without affecting which real assignment is optimal.
    R = C
    cost = jnp.concatenate(
        [cost, jnp.zeros((C - R0, C), jnp.float32)], axis=0)
    value = -cost                                   # auction maximizes
    span = jnp.maximum(value.max() - value.min(), 1e-6)
    rows = jnp.arange(R)
    cols = jnp.arange(C)

    def one_phase(carry, eps):
        p, _ = carry
        c4r0 = jnp.full(R, -1, jnp.int32)

        def cond(s):
            p, c4r, it = s
            return jnp.any(c4r < 0) & (it < iters_per_phase)

        def body(s):
            p, c4r, it = s
            unass = c4r < 0                          # [R]
            vals = value - p[None, :]                # [R, C]
            j_star = jnp.argmax(vals, axis=1)        # [R]
            w1 = jnp.take_along_axis(vals, j_star[:, None], 1)[:, 0]
            vals2 = vals.at[rows, j_star].set(-_INF)
            w2 = vals2.max(axis=1)
            bid = p[j_star] + (w1 - w2) + eps        # [R]

            # column-wise winner among this round's bidders
            bid_mat = jnp.where((cols[None, :] == j_star[:, None])
                                & unass[:, None], bid[:, None], -_INF)
            col_bid = bid_mat.max(axis=0)            # [C]
            col_winner = jnp.argmax(bid_mat, axis=0)
            has_bid = col_bid > -_INF

            p = jnp.where(has_bid, col_bid, p)
            row_won = unass & has_bid[j_star] & (col_winner[j_star] == rows)
            j_owned = jnp.clip(c4r, 0, C - 1)
            deposed = (c4r >= 0) & has_bid[j_owned] & (col_winner[j_owned] != rows)
            c4r = jnp.where(row_won, j_star,
                            jnp.where(deposed, -1, c4r))
            return p, c4r, it + 1

        p, c4r, _ = jax.lax.while_loop(cond, body, (p, c4r0, jnp.int32(0)))
        return (p, c4r), None

    # Strictly geometric /8 schedule: span/8 ... span/8^phases.  A large
    # jump between consecutive eps values reopens bidding wars (price gaps
    # must be re-climbed in +eps steps), so the ratio stays the classic 8;
    # 7 phases end at span*4.8e-7, giving R*eps_final far below any
    # meaningful cost gap.
    eps_schedule = span / 8.0 ** jnp.arange(1, phases + 1, dtype=jnp.float32)
    (p, c4r), _ = jax.lax.scan(one_phase,
                               (jnp.zeros(C, jnp.float32),
                                jnp.full(R, -1, jnp.int32)),
                               eps_schedule)

    # greedy fallback for any cap-tripped rows: cheapest free column
    def fix_row(i, s):
        c4r, taken = s
        free_cost = jnp.where(taken, _INF, cost[i])
        j = jnp.argmin(free_cost)
        need = c4r[i] < 0
        c4r = c4r.at[i].set(jnp.where(need, j, c4r[i]))
        taken = taken.at[c4r[i]].set(True)
        return c4r, taken

    # scatter only the ASSIGNED rows' columns (unassigned rows route to a
    # dropped overflow slot; a mixed set() at duplicate indices could
    # otherwise clear a genuinely-taken column)
    taken = jnp.zeros(C + 1, bool).at[
        jnp.where(c4r >= 0, c4r, C)].set(True)[:C]
    c4r, _ = jax.lax.fori_loop(0, R, fix_row, (c4r, taken))
    return c4r[:R0]


def linear_sum_assignment(cost: jnp.ndarray):
    """scipy-compatible wrapper: returns (row_ind, col_ind) minimizing cost.

    For cost [R, C]: if R <= C matches every row, else every column.
    """
    R, C = cost.shape
    if R <= C:
        rows = jnp.arange(R, dtype=jnp.int32)
        return rows, solve_lap(cost)
    # R > C: scipy returns row_ind sorted ascending with col_ind permuted;
    # solve_lap(cost.T) yields row-per-column order, so re-sort to keep the
    # documented contract
    rows = solve_lap(cost.T)
    order = jnp.argsort(rows)
    return rows[order], jnp.arange(C, dtype=jnp.int32)[order]


def match_padded(cost: jnp.ndarray, valid: jnp.ndarray,
                 solver: str = "jv") -> jnp.ndarray:
    """Hungarian match on a padded [Q, G] query-x-instance cost matrix.

    ``valid`` is a bool [G] mask of real (non-padded) ground-truth slots.
    Invalid columns are replaced with a constant-zero cost, which cannot
    change the optimal assignment of the valid columns (their contribution is
    identical no matter which queries they absorb; Q >= G guarantees enough
    queries remain).  Returns ``query4gt`` int32 [G]: for each GT slot the
    matched query index (meaningful only where ``valid``).

    ``solver``: "jv" (default) or "auction".  Measured at the matcher's
    shapes ([100, 40] x 20 lane-batched solves, v5e): the vmapped JV runs
    all 20 solves in 3.4 ms — its whiles batch perfectly across lanes —
    while the auction needs 59-193 ms (its bidding iterations are
    sequential per phase and the zero-cost dummy rows converge one per
    iteration).  The auction is kept as a tested alternative for much
    larger assignment problems where JV's O(R*C) sequential steps would
    dominate.
    """
    Q, G = cost.shape
    assert Q >= G
    safe = jnp.where(valid[None, :], cost, 0.0)
    fn = solve_lap_auction if solver == "auction" else solve_lap
    return fn(safe.T)
