"""Device-mesh construction."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int = -1, gauss: int = 1, tile: int = 1, devices=None) -> Mesh:
    """Build a (data, gauss, tile) mesh. ``data=-1`` consumes all remaining
    devices. Axis order puts ``tile`` innermost (its per-step payload-grad
    psum is the chattiest collective) then ``gauss`` so their collectives
    ride the fastest ICI links."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % (gauss * tile) == 0, (n, gauss, tile)
        data = n // (gauss * tile)
    assert data * gauss * tile == n, f"mesh {data}x{gauss}x{tile} != {n} devices"
    return Mesh(
        devices.reshape(data, gauss, tile), axis_names=("data", "gauss", "tile")
    )
