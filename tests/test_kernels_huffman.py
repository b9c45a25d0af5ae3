"""Device Huffman kernels vs the oracle's package-merge ground truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpucomp.kernels import huffman as k
from tpucomp.oracle import huffman as o


def device_lengths(freq_rows):
    freqs = jnp.asarray(np.asarray(freq_rows, np.int32))
    return np.asarray(k.huffman_code_lengths(freqs))


def kraft(lengths):
    return sum(2.0 ** -l for l in lengths if l > 0)


def cost(freqs, lengths):
    return sum(f * l for f, l in zip(freqs, lengths))


class TestLengths:
    def _check_row(self, freqs):
        [lengths] = device_lengths([freqs])
        # valid prefix code
        assert kraft(lengths) <= 1.0 + 1e-9
        assert max(lengths) <= 15
        # used symbols get codes; unused don't
        for f, l in zip(freqs, lengths):
            assert (l > 0) == (f > 0), (f, l)
        # within 1% of optimal package-merge cost
        opt = o.package_merge(list(freqs), 15)
        c_dev = cost(freqs, lengths)
        c_opt = cost(freqs, opt)
        assert c_dev <= c_opt * 1.01 + 16, (c_dev, c_opt)

    def test_uniformish(self, rng):
        freqs = [0] * 512
        for s in range(0, 512, 3):
            freqs[s] = rng.randrange(1, 100)
        self._check_row(freqs)

    def test_skewed(self):
        freqs = [0] * 512
        freqs[65] = 60000
        freqs[66] = 1
        freqs[67] = 1
        freqs[300] = 2
        self._check_row(freqs)

    def test_fibonacci_forces_limit(self):
        freqs = [0] * 512
        a, b = 1, 1
        for s in range(24):
            freqs[s] = a
            a, b = b, a + b
        [lengths] = device_lengths([freqs])
        assert max(lengths) == 15  # unlimited Huffman would exceed 15
        assert kraft(lengths) <= 1.0 + 1e-9

    def test_single_symbol(self):
        freqs = [0] * 512
        freqs[42] = 7
        [lengths] = device_lengths([freqs])
        assert lengths[42] == 1
        assert sum(lengths) == 1

    def test_two_symbols(self):
        freqs = [0] * 512
        freqs[1] = 10
        freqs[2] = 1
        [lengths] = device_lengths([freqs])
        assert lengths[1] == 1 and lengths[2] == 1

    def test_batch_rows_independent(self, rng):
        rows = []
        for _ in range(4):
            freqs = [0] * 512
            for s in rng.sample(range(512), 40):
                freqs[s] = rng.randrange(1, 5000)
            rows.append(freqs)
        batch = device_lengths(rows)
        singles = [device_lengths([r])[0] for r in rows]
        for b, s in zip(batch, singles):
            assert (b == s).all()

    def test_optimal_on_dyadic(self):
        # power-of-two freqs: Huffman is exactly the dyadic code
        freqs = [0] * 512
        freqs[0] = 8
        freqs[1] = 4
        freqs[2] = 2
        freqs[3] = 1
        freqs[4] = 1
        [lengths] = device_lengths([freqs])
        assert cost(freqs, lengths) == cost(
            freqs, o.package_merge(freqs, 15)
        )


class TestCanonical:
    def test_matches_oracle_codes(self, rng):
        freqs = [0] * 512
        for s in rng.sample(range(512), 60):
            freqs[s] = rng.randrange(1, 1000)
        [lengths] = device_lengths([freqs])
        codes_dev, fc, br, lim = k.canonical_from_lengths(
            jnp.asarray(np.asarray([lengths], np.int32))
        )
        codes_o = o.canonical_codes(list(lengths))
        assert list(np.asarray(codes_dev)[0]) == codes_o

    def test_rank_table_roundtrip(self, rng):
        freqs = [0] * 512
        picked = rng.sample(range(512), 33)
        for s in picked:
            freqs[s] = rng.randrange(1, 100)
        [lengths] = device_lengths([freqs])
        tbl = np.asarray(
            k.rank_to_symbol_table(jnp.asarray(np.asarray([lengths], np.int32)))
        )[0]
        order = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
        for r, (l, s) in enumerate(order):
            assert tbl[r] == s
