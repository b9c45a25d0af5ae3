"""Shared TPU kernel building blocks (SURVEY.md §2 rows 7–9 equivalents).

Everything here obeys the measured TPU cost model (no scatters, no
per-row gathers inside loops — see tpucomp/codecs/lznt1.py docstring):
scans, one-shot gathers, rolls, binary search, and XLA sorts only.
"""

from .common import (  # noqa: F401
    searchsorted_rows,
    le_words,
    hash_candidates,
    capped_matchlen,
    run_matchlens,
)
