"""Device mesh construction for data-parallel compression."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def data_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'data'.

    Multi-host: call jax.distributed.initialize() first; jax.devices()
    then spans the full slice and GSPMD shards units globally.
    """
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), ("data",))
