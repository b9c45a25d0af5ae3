"""Mesh data-parallelism tests on the 8-device virtual CPU mesh."""

import numpy as np

import jax

from tpucomp.dist import ShardedLZNT1, data_mesh
from tpucomp.oracle import lznt1 as oracle


def test_mesh_has_8_devices():
    assert jax.device_count() == 8  # conftest forces the virtual mesh


def test_sharded_roundtrip(corpus):
    mesh = data_mesh()
    sharded = ShardedLZNT1(mesh)
    data = corpus(4096 * 40)  # 40 chunks over 8 devices
    c = sharded.compress(data)
    assert sharded.decompress(c) == data
    # stitched stream is a standard LZNT1 stream: spec oracle decodes it
    assert oracle.decompress(c) == data


def test_sharded_matches_single_device(corpus):
    from tpucomp.codecs import lznt1 as single

    data = corpus(4096 * 16)
    mesh = data_mesh()
    sharded = ShardedLZNT1(mesh)
    assert sharded.compress(data) == single.compress(data)


def test_sharded_decodes_oracle_stream(corpus):
    data = corpus(100000)
    c = oracle.compress(data)
    mesh = data_mesh()
    sharded = ShardedLZNT1(mesh)
    assert sharded.decompress(c) == data


def test_graft_entry_single():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out, out_len, err = jax.jit(fn)(*args)
    assert not np.asarray(err).any()


def test_graft_entry_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
