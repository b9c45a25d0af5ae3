"""Generic mesh-sharded codecs for all formats + multi-host gather.

``ShardedCodec`` shards fixed-size unit batches over the ('data',) mesh
(units are independent by format design — SURVEY.md §2 parallel table),
runs the per-format batch kernels under GSPMD, gathers (payload,
lengths) and stitches on host 0 in unit order into an Archive.

Multi-host: after ``jax.distributed.initialize()`` the same code shards
globally; ``_host_gather`` uses ``multihost_utils.process_allgather`` to
materialize every shard on host 0 (padded payloads + true lengths, the
classic ragged-gather recipe — SURVEY.md §5 "Distributed comm backend").
On a single process it is the identity.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..errors import ArgError
from ..formats import Format, canonical
from ..util import pad_batch
from .archive import Archive, Manifest
from .mesh import data_mesh


def _host_gather(x):
    """Fully materialize a (possibly multi-host sharded) array on host."""
    if jax.process_count() > 1:  # pragma: no cover - needs a real pod
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


class ShardedCodec:
    """Data-parallel unit codec over a device mesh (any format)."""

    def __init__(self, fmt, mesh=None, unit_size=None):
        self.fmt = canonical(fmt)
        self.mesh = mesh if mesh is not None else data_mesh()
        self.ndev = self.mesh.devices.size
        self.batch_sharding = NamedSharding(self.mesh, P("data"))

        if self.fmt == Format.LZNT1:
            from ..codecs import lznt1 as m

            self.unit_size = unit_size or m.CHUNK
            if self.unit_size != m.CHUNK:
                raise ArgError("LZNT1 units are fixed 4096-byte chunks")
            self._mod = m
        elif self.fmt == Format.XPRESS:
            from ..codecs import xpress as m

            self.unit_size = unit_size or m.UNIT
            self._mod = m
        elif self.fmt == Format.XPRESS_HUFF:
            from ..codecs import xpress_huff as m

            self.unit_size = unit_size or m.BLOCK
            if self.unit_size > m.BLOCK:
                raise ArgError("XPRESS_HUFF units are single <=64 KiB blocks")
            self._mod = m
        else:
            raise ArgError(f"no sharded codec for {self.fmt.name}")

    def _pad(self, n):
        m = max(self.ndev, 8)
        b = pad_batch(n)
        return -(-b // m) * m

    # ---- encode ----------------------------------------------------------

    def compress(self, data: bytes, *, resume: "Archive|None" = None) -> Archive:
        data = bytes(data)
        u = self.unit_size
        units = [data[i : i + u] for i in range(0, len(data), u)] or [b""]
        start = resume.manifest.done_units if resume else 0
        manifest = (
            resume.manifest
            if resume
            else Manifest(fmt=int(self.fmt), unit_size=u)
        )
        payload = bytearray(resume.payload if resume else b"")
        todo = units[start:]
        if todo:
            streams = self._compress_units(todo)
            for s, unit in zip(streams, todo):
                manifest.unit_out_lens.append(len(unit))
                manifest.unit_comp_lens.append(len(s))
                payload += s
            manifest.done_units = len(units)
        return Archive(manifest, bytes(payload))

    def _compress_units(self, units):
        if self.fmt == Format.LZNT1:
            return self._lznt1_units(units, encode=True)
        return self._mod.compress_units(units, unit_size=self.unit_size)

    # ---- decode ----------------------------------------------------------

    def decompress(self, archive: Archive) -> bytes:
        if archive.manifest.fmt != int(self.fmt):
            raise ArgError("archive format mismatch")
        streams = archive.unit_streams()
        out_lens = archive.manifest.unit_out_lens
        if self.fmt == Format.LZNT1:
            return b"".join(self._lznt1_units(streams, encode=False))
        parts = self._mod.decompress_units(
            streams, out_lens, unit_size=self.unit_size
        )
        return b"".join(parts)

    # ---- LZNT1 unit adapters (chunk == unit) -----------------------------

    def _lznt1_units(self, units, encode: bool):
        m = self._mod
        if encode:
            N = self._pad(len(units))
            chunks = np.zeros((N, m.CHUNK), np.int32)
            clen = np.zeros(N, np.int32)
            for i, ud in enumerate(units):
                a = np.frombuffer(ud, np.uint8)
                chunks[i, : len(a)] = a
                clen[i] = len(a)
            payload, plen = m.encode_batch(jnp.asarray(chunks), jnp.asarray(clen))
            payload = _host_gather(payload)
            plen = _host_gather(plen)
            out = []
            for i, ud in enumerate(units):
                pl, cl = int(plen[i]), int(clen[i])
                if pl < cl:
                    out.append(
                        (0xB000 | (pl - 1)).to_bytes(2, "little")
                        + payload[i, :pl].astype(np.uint8).tobytes()
                    )
                else:
                    out.append((0x3000 | (cl - 1)).to_bytes(2, "little") + ud)
            return out
        else:
            # each unit stream is a 1-chunk LZNT1 stream
            N = self._pad(len(units))
            payload = np.zeros((N, m.PAYLOAD_PAD), np.int32)
            plen = np.zeros(N, np.int32)
            is_comp = np.zeros(N, bool)
            for i, s in enumerate(units):
                header = s[0] | (s[1] << 8)
                body = np.frombuffer(s[2:], np.uint8)
                payload[i, : len(body)] = body
                plen[i] = len(body)
                is_comp[i] = bool(header & 0x8000)
            out, out_lens, err = m.decode_batch(
                jnp.asarray(payload), jnp.asarray(plen), jnp.asarray(is_comp)
            )
            out = _host_gather(out)
            out_lens = _host_gather(out_lens)
            if _host_gather(err)[: len(units)].any():
                raise ArgError("LZNT1: malformed unit")
            return [
                out[i, : int(out_lens[i])].astype(np.uint8).tobytes()
                for i in range(len(units))
            ]
