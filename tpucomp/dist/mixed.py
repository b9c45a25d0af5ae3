"""Mixed-format batch jobs (BASELINE config 4).

A batch of (format, payload) jobs — e.g. LZNT1 + Xpress + Xpress-Huff
streams interleaved — is grouped by format, each group runs through its
sharded unit codec over the same mesh, and results return in job order.
Formats are independent pipelines; the mesh shards units within each
group (SURVEY.md §2 parallel table).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from ..formats import Format, canonical
from .archive import Archive
from .sharded import ShardedCodec


class MixedBatch:
    """Compress/decompress heterogeneous-format jobs over one mesh."""

    def __init__(self, mesh=None, unit_sizes=None):
        self.mesh = mesh
        self.unit_sizes = unit_sizes or {}
        self._codecs = {}

    def _codec(self, fmt: Format) -> ShardedCodec:
        if fmt not in self._codecs:
            self._codecs[fmt] = ShardedCodec(
                fmt, mesh=self.mesh, unit_size=self.unit_sizes.get(fmt)
            )
        return self._codecs[fmt]

    def compress(self, jobs: Sequence[Tuple[object, bytes]]) -> List[Archive]:
        """jobs: [(format, data), ...] -> [Archive, ...] in job order."""
        by_fmt = {}
        for i, (fmt, data) in enumerate(jobs):
            by_fmt.setdefault(canonical(fmt), []).append((i, data))
        results: List[Archive] = [None] * len(jobs)  # type: ignore
        for fmt, items in by_fmt.items():
            codec = self._codec(fmt)
            for i, data in items:
                results[i] = codec.compress(data)
        return results

    def decompress(self, archives: Sequence[Archive]) -> List[bytes]:
        out: List[bytes] = []
        for arch in archives:
            fmt = canonical(arch.manifest.fmt)
            out.append(self._codec(fmt).decompress(arch))
        return out
