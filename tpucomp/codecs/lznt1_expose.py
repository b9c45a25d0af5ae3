"""Unjitted views of the LZNT1 batch kernels for mesh-sharded jit.

jax.jit objects don't take in_shardings after the fact; dist/ needs the
raw implementations to wrap with per-mesh shardings.
"""

from .lznt1 import decode_batch, encode_batch

decode_batch_impl = decode_batch.__wrapped__
encode_batch_impl = encode_batch.__wrapped__
