"""Distributed exact-cover (dancing-links) puzzles.

Reference: ``EX/dancing/`` — ``DancingLinks.java`` (Knuth's Algorithm X),
``Pentomino.java`` / ``DistributedPentomino.java:45-71`` (split the search
tree into prefixes at a fixed depth, one map task per prefix, each task
solves its subtree), ``Sudoku.java`` (same solver, 9x9 cover matrix).

This port keeps the reference's distribution strategy — breadth-first
enumerate the search tree to ``depth`` prefixes driver-side (metadata-sized:
the cover matrix for a pentomino board is ~2k placements), parallelize one
task per prefix via ``mapInPandas``, aggregate counts — and reimplements
Algorithm X from its public specification with the standard dict-of-sets
formulation (no dancing-links pointer surgery needed in Python; the
set-based variant has the same column-selection heuristic and search
order semantics).

Solution counts for the standard 12-pentomino boards are famous public
constants (6x10: 2339, 5x12: 1010, 4x15: 368, 3x20: 2, distinct up to the
rectangle's 4 symmetries), which makes the whole distributed pipeline
oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# Algorithm X over dict-of-sets
# ---------------------------------------------------------------------------


def _select(X, Y, r):
    cols = []
    for j in Y[r]:
        for i in X[j]:
            for k in Y[i]:
                if k != j:
                    X[k].remove(i)
        cols.append(X.pop(j))
    return cols


def _deselect(X, Y, r, cols):
    for j in reversed(Y[r]):
        X[j] = cols.pop()
        for i in X[j]:
            for k in Y[i]:
                if k != j:
                    X[k].add(i)


def exact_cover_solutions(X, Y, solution=None):
    """Yield every exact cover of columns ``X`` (col -> set of row keys) by
    rows ``Y`` (row key -> list of cols). Mutates X during search (restores
    on backtrack); pass fresh structures per call."""
    if solution is None:
        solution = []
    if not X:
        yield list(solution)
        return
    c = min(X, key=lambda k: len(X[k]))
    for r in sorted(X[c]):
        solution.append(r)
        cols = _select(X, Y, r)
        yield from exact_cover_solutions(X, Y, solution)
        _deselect(X, Y, r, cols)
        solution.pop()


def search_prefixes(X, Y, depth: int):
    """Breadth-first prefixes of the Algorithm X search tree at ``depth``
    (DistributedPentomino.java:94: "a prefix of the search tree ... one
    value will be selected for each column in order"). Each returned prefix
    is a list of row keys consistent so far; the union of the subtrees under
    all prefixes is the full solution set, and prefixes are disjoint."""
    if depth == 0 or not X:
        return [[]]
    out = []
    c = min(X, key=lambda k: len(X[k]))
    for r in sorted(X[c]):
        cols = _select(X, Y, r)
        for rest in search_prefixes(X, Y, depth - 1):
            out.append([r] + rest)
        _deselect(X, Y, r, cols)
    return out


# ---------------------------------------------------------------------------
# Pentomino cover matrix (Pentomino.java piece definitions)
# ---------------------------------------------------------------------------

# The 12 free pentominoes as canonical cell sets (public shapes).
PIECES: dict[str, tuple[tuple[int, int], ...]] = {
    "F": ((0, 1), (0, 2), (1, 0), (1, 1), (2, 1)),
    "I": ((0, 0), (1, 0), (2, 0), (3, 0), (4, 0)),
    "L": ((0, 0), (1, 0), (2, 0), (3, 0), (3, 1)),
    "N": ((0, 1), (1, 1), (2, 0), (2, 1), (3, 0)),
    "P": ((0, 0), (0, 1), (1, 0), (1, 1), (2, 0)),
    "T": ((0, 0), (0, 1), (0, 2), (1, 1), (2, 1)),
    "U": ((0, 0), (0, 2), (1, 0), (1, 1), (1, 2)),
    "V": ((0, 0), (1, 0), (2, 0), (2, 1), (2, 2)),
    "W": ((0, 0), (1, 0), (1, 1), (2, 1), (2, 2)),
    "X": ((0, 1), (1, 0), (1, 1), (1, 2), (2, 1)),
    "Y": ((0, 1), (1, 0), (1, 1), (2, 1), (3, 1)),
    "Z": ((0, 0), (0, 1), (1, 1), (2, 1), (2, 2)),
}


def _orientations(cells, one_sided: bool = False):
    """All distinct rotations (and, unless ``one_sided``, reflections) of a
    piece, normalized to origin. ``one_sided=True`` is the
    OneSidedPentomino.java variant: pieces may rotate but not flip, so
    chiral pieces count as distinct and boards have different solution
    sets."""
    seen = set()
    cur = list(cells)
    for _flip in range(1 if one_sided else 2):
        for _rot in range(4):
            cur = [(c, -r) for r, c in cur]  # rotate 90°
            mr, mc = min(r for r, _ in cur), min(c for _, c in cur)
            norm = tuple(sorted((r - mr, c - mc) for r, c in cur))
            seen.add(norm)
        cur = [(r, -c) for r, c in cur]  # reflect
    return sorted(seen)


def pentomino_cover(width: int, height: int, one_sided: bool = False):
    """Columns = 60 board cells + 12 piece names; rows = every placement of
    every orientation of every piece (row key = (piece, cells))."""
    if width * height != 60:
        raise ValueError("pentomino boards have exactly 60 cells")
    Y = {}
    for name, base in PIECES.items():
        for shape in _orientations(base, one_sided):
            h = max(r for r, _ in shape) + 1
            w = max(c for _, c in shape) + 1
            for r0 in range(height - h + 1):
                for c0 in range(width - w + 1):
                    cells = tuple((r0 + r) * width + (c0 + c) for r, c in shape)
                    Y[(name, cells)] = [name, *cells]
    X = {c: set() for c in list(PIECES) + list(range(width * height))}
    for rk, cols in Y.items():
        for c in cols:
            X[c].add(rk)
    return X, Y


def render_solution(width: int, height: int, rows) -> str:
    """Solution rows -> board string of piece letters (row-major)."""
    board = [None] * (width * height)
    for name, cells in rows:
        for cell in cells:
            board[cell] = name
    return "".join(board)


def canonical_board(board: str, width: int, height: int) -> str:
    """Min over the rectangle's symmetry group (identity, 180°, horizontal
    and vertical flips) — the standard dedup for 'distinct solutions'."""
    grid = [board[r * width : (r + 1) * width] for r in range(height)]
    variants = []
    for g in (grid, [row for row in reversed(grid)]):
        for gg in (g, [row[::-1] for row in g]):
            variants.append("".join(gg))
    return min(variants)


def solve_pentomino(
    spark: SparkSession, width: int = 15, height: int = 4, depth: int = 3
) -> DataFrame:
    """Distributed pentomino count: prefixes of the search tree fan out one
    task each (DistributedPentomino's getSplits); each task solves its
    subtree and emits canonical boards. Returns (board, n_raw) per distinct
    canonical solution.

    Scale shape: the cover matrix is metadata (~2k placements); work
    distributes over prefixes (hundreds for depth>=2) with no shuffle until
    the final count aggregation.
    """
    import pandas as pd

    X, Y = pentomino_cover(width, height)
    prefixes = search_prefixes(X, Y, depth)

    def solve_prefix(batches):
        for pdf in batches:
            for pid in pdf["prefix_id"]:
                # fresh cover per prefix: building it is milliseconds next to
                # the subtree search, and avoids restore bookkeeping
                Xl, Yl = pentomino_cover(width, height)
                prefix = prefixes[int(pid)]
                for r in prefix:
                    _select(Xl, Yl, r)
                boards = [
                    canonical_board(
                        render_solution(width, height, prefix + rest), width, height
                    )
                    for rest in exact_cover_solutions(Xl, Yl)
                ]
                yield pd.DataFrame({"board": boards, "n": [1] * len(boards)})

    parts = (
        spark.range(len(prefixes))
        .withColumnRenamed("id", "prefix_id")
        .repartition(min(len(prefixes), 64))
    )
    from pyspark.sql import functions as F

    sols = parts.mapInPandas(solve_prefix, "board string, n int")
    return sols.groupBy("board").agg(F.sum("n").cast("bigint").alias("n_raw"))


# ---------------------------------------------------------------------------
# Sudoku (Sudoku.java: same exact-cover engine, 324 constraint columns)
# ---------------------------------------------------------------------------


def sudoku_cover(puzzle: list[list[int]]):
    """9x9 sudoku as exact cover: columns are (cell filled), (row, digit),
    (col, digit), (box, digit); rows are candidate placements."""
    Y = {}
    for r in range(9):
        for c in range(9):
            given = puzzle[r][c]
            for d in range(1, 10):
                if given and d != given:
                    continue
                b = (r // 3) * 3 + c // 3
                Y[(r, c, d)] = [
                    ("cell", r, c),
                    ("row", r, d),
                    ("col", c, d),
                    ("box", b, d),
                ]
    X = {}
    for rk, cols in Y.items():
        for col in cols:
            X.setdefault(col, set()).add(rk)
    return X, Y


def solve_sudoku(puzzle: list[list[int]]):
    """Yield solved grids (list of 81 digits, row-major)."""
    X, Y = sudoku_cover(puzzle)
    if len(X) < 324:  # a constraint with no candidates -> unsatisfiable
        return
    for rows in exact_cover_solutions(X, Y):
        grid = [0] * 81
        for r, c, d in rows:
            grid[r * 9 + c] = d
        yield grid


def solve_sudokus(spark: SparkSession, puzzles: DataFrame) -> DataFrame:
    """Distributed sudoku solving: (puzzle_id, puzzle string of 81 chars,
    0/'.' for blanks) -> (puzzle_id, solution string, n_solutions). One
    puzzle per row — embarrassingly parallel, the reference's one-map-per-
    puzzle-file model."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for pid, s in zip(pdf["puzzle_id"], pdf["puzzle"]):
                cells = [0 if ch in "0." else int(ch) for ch in s]
                grid = [cells[r * 9 : r * 9 + 9] for r in range(9)]
                sols = []
                for g in solve_sudoku(grid):
                    sols.append("".join(map(str, g)))
                    if len(sols) > 1:
                        break  # uniqueness check needs at most 2
                out.append(
                    (int(pid), sols[0] if sols else None, len(sols))
                )
            yield pd.DataFrame(out, columns=["puzzle_id", "solution", "n_solutions"])

    return puzzles.mapInPandas(
        run, "puzzle_id bigint, solution string, n_solutions int"
    )
