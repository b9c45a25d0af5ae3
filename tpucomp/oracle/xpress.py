"""Plain LZ77 "Xpress" oracle codec — spec-exact [MS-XCA] §2.3–2.4.

Capability parity target: reference ``src/xpress_compress.cpp`` /
``src/xpress_decompress.cpp`` (SURVEY.md §2 row 4; mount unavailable —
grounded in [MS-XCA], SURVEY.md §8.2).

Format summary:

* Stream of 32-bit LE flag words, bits consumed MSB→LSB; 1 = match,
  0 = literal byte.  A fresh flag word is read when 32 flags are exhausted.
  The flag word precedes, in the byte stream, the tokens it describes.
* Match token: u16 LE = ``((offset - 1) << 3) | min(len - 3, 7)``;
  offset ∈ [1, 8192] (13 bits), min length 3.
* Length escape chain when the 3-bit field == 7 ([MS-XCA] §2.4 pseudocode)::

      L = tok & 7
      if L == 7:
          L = nibble()            # shared-nibble state, see below
          if L == 15:
              L = byte()
              if L == 255:
                  L = u16();  if L == 0: L = u32()
                  if L < 15 + 7: error
                  L -= (15 + 7)
              L += 15
          L += 7
      length = L + 3

  The *shared nibble*: the first escape reads a fresh byte at the current
  position and uses its low nibble (remembering the byte's position); the
  second consumes the remembered byte's high nibble; alternating.
* No terminator: the encoder pads the final flag word's unused bits with 1s;
  the decoder stops at the expected output size (which the caller must know).

Worked spec vectors ([MS-XCA] §3.1) are in tests/test_oracle_xpress.py.
"""

from __future__ import annotations

from ..errors import ArgError, DataError

MIN_MATCH = 3
MAX_OFFSET = 8192


def max_compressed_size(n: int) -> int:
    """Worst case: all literals → 1 flag word per 32 bytes + final flag word."""
    return n + 4 * ((n + 31) // 32) + 4


class _Writer:
    """Flag-word + byte-stream writer with shared-nibble escape state."""

    def __init__(self):
        self.out = bytearray()
        self.flags = 0
        self.flag_count = 0
        self.flag_pos = None  # reserved position of current flag word
        self.nibble_pos = -1  # output index of byte holding a pending high nibble

    def _ensure_flag_slot(self):
        if self.flag_pos is None:
            self.flag_pos = len(self.out)
            self.out += b"\x00\x00\x00\x00"

    def put_flag(self, bit: int):
        self._ensure_flag_slot()
        self.flags = ((self.flags << 1) | bit) & 0xFFFFFFFF
        self.flag_count += 1
        if self.flag_count == 32:
            self.out[self.flag_pos : self.flag_pos + 4] = self.flags.to_bytes(
                4, "little"
            )
            self.flags = 0
            self.flag_count = 0
            self.flag_pos = None

    def put_byte(self, b: int):
        self.out.append(b)

    def put_u16(self, v: int):
        self.out += v.to_bytes(2, "little")

    def put_nibble(self, v: int):
        if self.nibble_pos < 0:
            self.nibble_pos = len(self.out)
            self.out.append(v & 0xF)
        else:
            self.out[self.nibble_pos] |= (v & 0xF) << 4
            self.nibble_pos = -1

    def finish(self) -> bytes:
        if self.flag_pos is not None:
            rem = 32 - self.flag_count
            flags = ((self.flags << rem) | ((1 << rem) - 1)) & 0xFFFFFFFF
            self.out[self.flag_pos : self.flag_pos + 4] = flags.to_bytes(
                4, "little"
            )
            self.flag_pos = None
        return bytes(self.out)


def _emit_match(w: _Writer, offset: int, length: int):
    """Emit one match token with the full escape chain of [MS-XCA] §2.3."""
    w.put_flag(1)
    L = length - MIN_MATCH
    w.put_u16(((offset - 1) << 3) | min(L, 7))
    if L >= 7:
        L -= 7
        w.put_nibble(min(L, 15))
        if L >= 15:
            L -= 15
            if L < 255:
                w.put_byte(L)
            else:
                w.put_byte(255)
                # u16 holds length-3 absolutely; 0 escapes to u32.
                full = length - MIN_MATCH
                if full < 0x10000 and full != 0:
                    w.put_u16(full)
                else:
                    w.put_u16(0)
                    w.out += full.to_bytes(4, "little")


def compress(data: bytes, *, window: int = MAX_OFFSET, max_chain: int = 64) -> bytes:
    """Greedy LZ77 encode over the whole buffer (window ≤ 8192 back)."""
    data = bytes(data)
    n = len(data)
    w = _Writer()
    table: dict = {}  # 3-byte prefix -> positions
    pos = 0
    while pos < n:
        best_len = 0
        best_off = 0
        if pos + MIN_MATCH <= n:
            key = data[pos : pos + 3]
            chain = table.get(key, ())
            tried = 0
            for cand in reversed(chain):
                if pos - cand > window:
                    break
                tried += 1
                if tried > max_chain:
                    break
                length = 0
                limit = n - pos
                while length < limit and data[cand + length] == data[pos + length]:
                    length += 1
                if length > best_len:
                    best_len = length
                    best_off = pos - cand
                    if length >= limit:
                        break
        if best_len >= MIN_MATCH:
            _emit_match(w, best_off, best_len)
            end = min(pos + best_len, n - 2)
            step = 1 if best_len < 1024 else best_len  # skip interior of huge runs
            for q in range(pos, end, step):
                table.setdefault(data[q : q + 3], []).append(q)
            pos += best_len
        else:
            w.put_flag(0)
            w.put_byte(data[pos])
            if pos + 3 <= n:
                table.setdefault(data[pos : pos + 3], []).append(pos)
            pos += 1
    return w.finish()


def decompress(data: bytes, out_len: int) -> bytes:
    """Decode exactly ``out_len`` bytes ([MS-XCA] §2.4 pseudocode)."""
    if out_len is None:
        raise ArgError("Xpress: out_len is required (format has no size header)")
    data = bytes(data)
    out = bytearray()
    i = 0
    n = len(data)
    flags = 0
    flag_count = 0
    nibble_pos = -1
    while len(out) < out_len:
        if flag_count == 0:
            if i + 4 > n:
                raise DataError("Xpress: truncated flag word")
            flags = int.from_bytes(data[i : i + 4], "little")
            i += 4
            flag_count = 32
        is_match = (flags >> 31) & 1
        flags = (flags << 1) & 0xFFFFFFFF
        flag_count -= 1
        if not is_match:
            if i >= n:
                raise DataError("Xpress: truncated literal")
            out.append(data[i])
            i += 1
        else:
            if i + 2 > n:
                raise DataError("Xpress: truncated match token")
            tok = int.from_bytes(data[i : i + 2], "little")
            i += 2
            offset = (tok >> 3) + 1
            L = tok & 7
            if L == 7:
                if nibble_pos < 0:
                    if i >= n:
                        raise DataError("Xpress: truncated nibble escape")
                    nibble_pos = i
                    L = data[i] & 0xF
                    i += 1
                else:
                    L = data[nibble_pos] >> 4
                    nibble_pos = -1
                if L == 15:
                    if i >= n:
                        raise DataError("Xpress: truncated byte escape")
                    L = data[i]
                    i += 1
                    if L == 255:
                        if i + 2 > n:
                            raise DataError("Xpress: truncated u16 escape")
                        L = int.from_bytes(data[i : i + 2], "little")
                        i += 2
                        if L == 0:
                            if i + 4 > n:
                                raise DataError("Xpress: truncated u32 escape")
                            L = int.from_bytes(data[i : i + 4], "little")
                            i += 4
                        if L < 15 + 7:
                            raise DataError("Xpress: invalid escape length")
                        L -= 15 + 7
                    L += 15
                L += 7
            length = L + MIN_MATCH
            if offset > len(out):
                raise DataError("Xpress: match offset before start of output")
            if len(out) + length > out_len:
                raise DataError("Xpress: match overruns expected output size")
            for _ in range(length):
                out.append(out[-offset])
    return bytes(out)
