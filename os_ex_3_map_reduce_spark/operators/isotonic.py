"""Isotonic regression — PAVA over distributed per-bucket aggregates.

The calibration primitive (score → monotone empirical rate, the
isotonic step of every probability-calibration / ranking-calibration
pipeline): fit the best monotone (least-squares) curve to observed
bucket rates. spark.ml's IsotonicRegression exists but is float-path
and partition-order-sensitive in its pooling; this implementation is
EXACT: all pooling decisions compare rates cross-multiplied
(s_a·w_b > s_b·w_a — never a float), so the fit is a pure function of
the integer aggregates.

Distribution shape: the data-sized work is the per-bucket (weight,
sum) aggregate — one map-side-combined groupBy. PAVA itself runs on
the DRIVER over the bounded bucket relation (the planner-constant
rule: buckets are a fixed-size design choice, like centroids or
codebooks — ≤ thousands, never data-sized). The classical stack
algorithm is O(n) and sequential by nature; parallel variants exist
(per-partition PAVA + boundary merge) but are pointless below
millions of buckets.

Correctness anchor: PAVA's output equals the minimax formula
fit_i = max_{j≤i} min_{k≥i} avg(y[j..k]) (Robertson-Wright-Dykstra),
which IS SQL-expressible — q_isotonic_calibration's oracle evaluates
it directly with prefix sums, and the property test checks the
identity on random integer inputs.
"""

from __future__ import annotations

from fractions import Fraction


def pava(blocks: list[tuple[int, int]]) -> list[float]:
    """Pool-adjacent-violators over ``blocks`` = [(weight, sum), ...]
    in x order. Returns the fitted value per input block, each the
    exact block average s/w evaluated in ONE IEEE divide. Pooling
    compares cross-multiplied — no float enters a decision."""
    if any(w <= 0 for w, _ in blocks):
        raise ValueError("pava: weights must be positive")
    # stack of (w, s, n_inputs)
    stack: list[list[int]] = []
    for w, s in blocks:
        stack.append([w, s, 1])
        # pool while the last two blocks violate monotonicity:
        # s_prev/w_prev > s_cur/w_cur  <=>  s_prev*w_cur > s_cur*w_prev
        while (
            len(stack) >= 2
            and stack[-2][1] * stack[-1][0] > stack[-1][1] * stack[-2][0]
        ):
            w2, s2, n2 = stack.pop()
            stack[-1][0] += w2
            stack[-1][1] += s2
            stack[-1][2] += n2
    out: list[float] = []
    for w, s, n in stack:
        out.extend([s / w] * n)
    return out


def minimax_reference(blocks: list[tuple[int, int]]) -> list[float]:
    """The O(n³) minimax definition, in exact rationals — the oracle's
    formula, used by the property test to pin pava() against the
    textbook identity."""
    n = len(blocks)
    w = [b[0] for b in blocks]
    s = [b[1] for b in blocks]
    pw = [0] * (n + 1)
    ps = [0] * (n + 1)
    for i in range(n):
        pw[i + 1] = pw[i] + w[i]
        ps[i + 1] = ps[i] + s[i]

    def avg(j: int, k: int) -> Fraction:  # blocks j..k inclusive
        return Fraction(ps[k + 1] - ps[j], pw[k + 1] - pw[j])

    out = []
    for i in range(n):
        best = max(min(avg(j, k) for k in range(i, n)) for j in range(i + 1))
        out.append(best.numerator / best.denominator)
    return out
