"""North-star extras: training-data-pipeline operators over documents /
embeddings / events (SURVEY.md §7 phase E). Filled in incrementally; each
entry is both a library operator (operators/*) and a declared query here.
"""

from __future__ import annotations
