"""Device-mesh construction."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int = -1, gauss: int = 1, devices=None) -> Mesh:
    """Build a (data, gauss) mesh. ``data=-1`` consumes all remaining
    devices. Axis order puts ``gauss`` innermost so its collectives ride the
    fastest ICI links."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % gauss == 0, (n, gauss)
        data = n // gauss
    assert data * gauss == n, f"mesh {data}x{gauss} != {n} devices"
    return Mesh(devices.reshape(data, gauss), axis_names=("data", "gauss"))
