"""Exact-cover engine: counts pinned to the famous public pentomino
constants (3x20 board: 2 distinct solutions / 8 fixed; 4x15: 368/1472 —
the latter verified once during development, exercised in the registered
query, and too slow for unit CI), plus sudoku soundness cases."""

from __future__ import annotations

from hadoop_2_7_1_spark.operators.dancing import (
    PIECES,
    _orientations,
    canonical_board,
    exact_cover_solutions,
    pentomino_cover,
    render_solution,
    search_prefixes,
    solve_pentomino,
    solve_sudoku,
    solve_sudokus,
)


def test_orientation_counts():
    # public combinatorics: I has 2 fixed orientations, X has 1, F has 8;
    # total fixed pentominoes = 63
    n = {name: len(_orientations(cells)) for name, cells in PIECES.items()}
    assert n["I"] == 2 and n["X"] == 1 and n["F"] == 8
    assert sum(n.values()) == 63


def test_pentomino_3x20_public_counts():
    X, Y = pentomino_cover(20, 3)
    boards = [
        canonical_board(render_solution(20, 3, s), 20, 3)
        for s in exact_cover_solutions(X, Y)
    ]
    assert len(boards) == 8 and len(set(boards)) == 2


def test_prefixes_partition_the_search():
    # solving every depth-2 prefix subtree reproduces the full solution set
    X, Y = pentomino_cover(20, 3)
    prefixes = search_prefixes(X, Y, 2)
    total = []
    from hadoop_2_7_1_spark.operators.dancing import _select

    for p in prefixes:
        Xl, Yl = pentomino_cover(20, 3)
        for r in p:
            _select(Xl, Yl, r)
        for rest in exact_cover_solutions(Xl, Yl):
            total.append(canonical_board(render_solution(20, 3, p + rest), 20, 3))
    assert len(total) == 8 and len(set(total)) == 2


def test_distributed_pentomino(spark):
    rows = solve_pentomino(spark, width=20, height=3, depth=2).collect()
    assert len(rows) == 2  # one row per distinct canonical board
    assert sum(r.n_raw for r in rows) == 8


def test_sudoku_unique_unsat_multi(spark):
    grid = [[(i * 3 + i // 3 + j) % 9 + 1 for j in range(9)] for i in range(9)]
    flat = "".join(str(grid[r][c]) for r in range(9) for c in range(9))

    unsat = "110000000" + "0" * 72  # two 1s in one row
    nearly_empty = "123456789" + "0" * 72  # many solutions
    puzzle = (
        "123400089456089120009003456034060090060891204001204060045078900600910345012345678"
    )
    df = spark.createDataFrame(
        [(0, puzzle), (1, unsat), (2, nearly_empty)], "puzzle_id bigint, puzzle string"
    )
    rows = {r.puzzle_id: r for r in solve_sudokus(spark, df).collect()}
    assert rows[0].n_solutions == 1 and rows[0].solution == flat
    assert rows[1].n_solutions == 0 and rows[1].solution is None
    assert rows[2].n_solutions == 2  # capped: "more than one" is the verdict

    # engine-level: the solver lazily yields grids (don't exhaust the ~6.7e21
    # completions of an empty board — take one)
    import itertools

    first = next(iter(itertools.islice(solve_sudoku([[0] * 9 for _ in range(9)]), 1)))
    assert sorted(first[:9]) == list(range(1, 10))


def test_one_sided_orientations_drop_reflections():
    """OneSidedPentomino.java variant: rotations only. Chiral pieces lose
    their mirror orientations; achiral pieces are unchanged."""
    from hadoop_2_7_1_spark.operators.dancing import PIECES, _orientations

    total_full = total_one = 0
    for name, base in PIECES.items():
        full = _orientations(base)
        one = _orientations(base, one_sided=True)
        assert set(one) <= set(full)
        total_full += len(full)
        total_one += len(one)
    # the 12 free pentominoes have 63 fixed orientations; one-sided keeps
    # rotations only (public combinatorial facts)
    assert total_full == 63
    assert total_one < total_full


def test_one_sided_cover_excludes_mirror_placements():
    from hadoop_2_7_1_spark.operators.dancing import pentomino_cover

    X_full, Y_full = pentomino_cover(20, 3)
    X_one, Y_one = pentomino_cover(20, 3, one_sided=True)
    assert set(Y_one) <= set(Y_full)
    assert len(Y_one) < len(Y_full)
