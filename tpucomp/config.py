"""Runtime configuration (SURVEY.md §5 "Config / flag system").

The reference used compile-time preprocessor toggles
(``MSCOMP_WITHOUT_<FMT>``-style, ``ALL_AT_ONCE`` — recalled surface);
here configuration is a runtime dataclass: format parameters where the
spec allows them, mesh shape, match-finder effort, backend selection.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class MatchFinderConfig:
    """Effort knobs for the shared TPU match finder (kernels/common.py)."""

    hash_bits: int = 13
    num_candidates: int = 2  # same-hash candidates tried per position
    cap: int = 16  # capped compare depth (bytes) for hash candidates
    run_disps: Tuple[int, ...] = (1, 2, 3)  # exact small-displacement runs


@dataclass
class ResolveConfig:
    """LZ copy-resolution knobs (kernels/common.resolve_copies)."""

    window: int = 256  # in-scan exact window; larger = fewer far rounds


@dataclass
class Config:
    backend: str = "auto"  # oracle | cpu | tpu | auto
    batch_multiple: int = int(os.environ.get("TPUCOMP_BATCH_MULTIPLE", "256"))
    xpress_unit_size: int = 65536  # batch-mode segment size (plain Xpress)
    xh_unit_size: int = 65536  # <= 65536 (single block per unit)
    match: MatchFinderConfig = field(default_factory=MatchFinderConfig)
    resolve: ResolveConfig = field(default_factory=ResolveConfig)
    emit_lznt1_terminator: bool = False
    mesh_axis: str = "data"


DEFAULT = Config()
