"""Property-based tests (hypothesis) for the PURE arithmetic cores that
both engines execute — the formulas are mirrored in Python exactly as the
Spark/DuckDB expressions compute them, so these probe the invariants over
thousands of inputs where the hand tests pin single examples."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st


# --- systematic resampling stride formula (operators/sampling.py) --------

def _f(c: int, n_out: int, W: int) -> int:
    # (2*n_out*c + W) div (2*W) with positive numerator: truncation==floor
    return (2 * n_out * c + W) // (2 * W)


@settings(max_examples=200, deadline=None)
@given(
    weights=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=200),
    n_out=st.integers(min_value=1, max_value=500),
)
def test_systematic_stride_formula_invariants(weights, n_out):
    W = sum(weights)
    cum = 0
    total = 0
    for w in weights:
        cum += w
        picked = _f(cum, n_out, W) - _f(cum - w, n_out, W)
        exp = w * n_out / W
        # every record draws floor or ceil of its expectation
        assert math.floor(exp) <= picked <= math.ceil(exp)
        total += picked
    # the systematic guarantee — total draws EXACTLY n_out
    assert total == n_out


# --- KMV merge (operators/sketches.py) -----------------------------------

@settings(max_examples=100, deadline=None)
@given(
    a=st.lists(st.floats(min_value=0, max_value=1, exclude_max=True), max_size=50),
    b=st.lists(st.floats(min_value=0, max_value=1, exclude_max=True), max_size=50),
    k=st.integers(min_value=1, max_value=16),
)
def test_kmv_merge_commutative_and_bounded(a, b, k):
    from hadoop_2_7_1_spark.operators.sketches import merge_kmv

    m1 = merge_kmv([a, b], k)
    m2 = merge_kmv([b, a], k)
    assert m1 == m2  # union is order-free
    assert len(m1) <= k and m1 == sorted(m1)
    # merging a sketch with itself is idempotent
    assert merge_kmv([m1, m1], k) == m1


# --- jackknife reduction (operators/aggregates.py) -----------------------

@settings(max_examples=100, deadline=None)
@given(
    cells=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**9),
            st.integers(min_value=1, max_value=10**6),
        ),
        min_size=2,
        max_size=20,
    )
)
def test_jackknife_se_matches_direct_formula(cells):
    from hadoop_2_7_1_spark.operators.aggregates import jackknife_se

    tn = sum(n for n, _ in cells)
    td = sum(d for _, d in cells)
    rows = []
    for n, d in cells:
        if td == d:  # degenerate: removing this stratum empties the denominator
            return
        rows.append(
            {"num_cents": n, "den_cents": d, "theta_loo": (tn - n) / (td - d)}
        )
    theta, se = jackknife_se(rows)
    assert abs(theta - tn / td) < 1e-12
    g = len(rows)
    loos = [r["theta_loo"] for r in rows]
    mean = sum(loos) / g
    var = (g - 1) / g * sum((x - mean) ** 2 for x in loos)
    assert abs(se - math.sqrt(var)) < 1e-12
    # identical strata -> zero variance
    if len({(n, d) for n, d in cells}) == 1:
        assert se < 1e-9


# --- KS cross-multiplied integers vs float ECDF --------------------------

@settings(max_examples=100, deadline=None)
@given(
    a=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=100),
    b=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=100),
)
def test_ks_integer_form_matches_float_ecdf(a, b):
    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    ca = cb = 0
    best_int = 0
    best_float = 0.0
    for v in values:
        ca += sum(1 for x in a if x == v)
        cb += sum(1 for x in b if x == v)
        best_int = max(best_int, abs(ca * nb - cb * na))
        best_float = max(best_float, abs(ca / na - cb / nb))
    assert abs(best_int / (na * nb) - best_float) < 1e-9
