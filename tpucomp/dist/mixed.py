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
from .sharded import ShardedCodec, _host_gather


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
        """jobs: [(format, data), ...] -> [Archive, ...] in job order.

        Same-format jobs are batched into ONE device dispatch per format
        (VERDICT r2 weak #8: BASELINE config 4 is an interleaved batch —
        per-job dispatches leave the mesh underfilled): all jobs' units
        are concatenated, compressed in one call, and the streams split
        back per job.
        """
        from .archive import Manifest

        from ..stats import RunStats, device_trace, timed

        by_fmt = {}
        for i, (fmt, data) in enumerate(jobs):
            by_fmt.setdefault(canonical(fmt), []).append((i, bytes(data)))
        results: List[Archive] = [None] * len(jobs)  # type: ignore
        for fmt, items in by_fmt.items():
            codec = self._codec(fmt)
            u = codec.unit_size
            all_units: List[bytes] = []
            spans = []  # (job index, first unit, unit count)
            for i, data in items:
                units = [data[k : k + u] for k in range(0, len(data), u)] or [b""]
                spans.append((i, len(all_units), len(units)))
                all_units += units
            # per-format stats/trace, mirroring ShardedCodec.compress
            # (the batched path bypasses it by calling _compress_units)
            stats = RunStats(fmt=canonical(fmt).name, units=len(all_units))
            with timed(stats), device_trace(codec.trace_dir):
                streams = codec._compress_units(all_units)
            stats.in_bytes = sum(len(t) for t in all_units)
            stats.out_bytes = sum(len(s) for s in streams)
            codec.last_stats = stats
            for i, first, nu in spans:
                manifest = Manifest(fmt=int(fmt), unit_size=u)
                payload = bytearray()
                for k in range(first, first + nu):
                    manifest.unit_out_lens.append(len(all_units[k]))
                    manifest.unit_comp_lens.append(len(streams[k]))
                    payload += streams[k]
                manifest.done_units = nu
                results[i] = Archive(manifest, bytes(payload))
        return results

    def decompress(self, archives: Sequence[Archive]) -> List[bytes]:
        """Batched mirror of :meth:`compress`: all same-format archives'
        unit streams decode in one call per format."""
        from ..errors import ArgError
        from ..stats import RunStats, device_trace, timed

        by_fmt = {}
        for i, arch in enumerate(archives):
            by_fmt.setdefault(canonical(arch.manifest.fmt), []).append(i)
        out: List[bytes] = [None] * len(archives)  # type: ignore
        for fmt, idxs in by_fmt.items():
            codec = self._codec(fmt)
            all_streams: List[bytes] = []
            all_olens: List[int] = []
            spans = []
            for i in idxs:
                arch = archives[i]
                if arch.manifest.unit_size != codec.unit_size:
                    raise ArgError("archive unit_size mismatch in batch")
                streams = arch.unit_streams()
                spans.append((i, len(all_streams), len(streams)))
                all_streams += streams
                all_olens += arch.manifest.unit_out_lens
            stats = RunStats(fmt=canonical(fmt).name, units=len(all_streams),
                             out_bytes=sum(len(s) for s in all_streams))
            with timed(stats), device_trace(codec.trace_dir):
                if fmt == Format.LZNT1:
                    parts = codec._lznt1_units(all_streams, encode=False)
                else:
                    parts = codec._mod.decompress_units(
                        all_streams, all_olens, unit_size=codec.unit_size,
                        jitter=codec.jitter, pad_to=max(codec.ndev, 8),
                        gather=_host_gather)
            stats.in_bytes = sum(len(p) for p in parts)
            codec.last_stats = stats
            for i, first, nu in spans:
                out[i] = b"".join(parts[first : first + nu])
        return out
