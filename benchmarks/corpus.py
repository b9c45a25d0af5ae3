"""Deterministic benchmark corpus.

Silesia/Calgary are not on this host (SURVEY.md §4); this builds a
reproducible mixed-entropy stand-in with a similar composition: natural
text, source code, binary executables/libraries, and structured/periodic
data.  Real files are read from stable system locations; synthetic
fillers are seeded.
"""

from __future__ import annotations

import glob
import random


def _real_files(budget: int) -> bytes:
    """Concatenate stable on-disk files (text + binary) up to ``budget``."""
    candidates = (
        sorted(glob.glob("/usr/local/lib/python3.12/*.py"))[:60]
        + sorted(glob.glob("/opt/venv/lib/python3.12/site-packages/numpy/_core/*.py"))[:20]
        + sorted(glob.glob("/usr/local/lib/python3.12/lib-dynload/*.so"))[:10]
        + ["/etc/ssl/certs/ca-certificates.crt"]
    )
    out = bytearray()
    for path in candidates:
        try:
            with open(path, "rb") as f:
                out += f.read()
        except OSError:
            continue
        if len(out) >= budget:
            break
    return bytes(out[:budget])


def _synthetic(budget: int, seed: int = 1234) -> bytes:
    rng = random.Random(seed)
    words = [
        b"compression ", b"throughput ", b"pipeline ", b"systolic ",
        b"the ", b"of ", b"and ", b"data ", b"block ", b"stream ",
    ]
    out = bytearray()
    while len(out) < budget:
        kind = rng.randrange(5)
        if kind == 0:
            out += rng.choice(words)
        elif kind == 1:
            out += bytes([rng.randrange(256)]) * rng.randrange(4, 200)
        elif kind == 2:
            pat = bytes(rng.randrange(256) for _ in range(rng.randrange(3, 17)))
            out += pat * rng.randrange(2, 40)
        elif kind == 3:
            out += bytes(rng.randrange(256) for _ in range(rng.randrange(8, 120)))
        else:
            base = rng.randrange(256)
            out += bytes((base + i) % 256 for i in range(rng.randrange(16, 90)))
    return bytes(out[:budget])


def silesia_like(total: int) -> bytes:
    """~2/3 real on-disk bytes + ~1/3 seeded synthetic, deterministic."""
    real = _real_files(total * 2 // 3)
    synth = _synthetic(total - len(real))
    return (real + synth)[:total]
