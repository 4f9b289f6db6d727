"""Camera model as a JAX pytree.

Replaces the reference's ``scene/cameras.py`` (torch ``nn.Module`` holding
transposed matrices for row-vector multiplication). Here matrices are stored
untransposed and applied as ``M @ [x; 1]``; image size is static metadata so
cameras can flow through ``jit`` without retriggering compilation per view.

Convention parity (reference/utils/graphics_utils.py:31-84):
- ``R`` given to the constructor is the camera-to-world rotation, ``T`` the
  world-to-camera translation (COLMAP convention as used by 3DGS),
  so world-to-view = [[R^T, T], [0, 1]].
- projection uses z_sign=+1 with depth mapped via zfar/(zfar-znear).
- znear=0.01, zfar=100 (reference/scene/cameras.py:64-65).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


def world_to_view_matrix(R: np.ndarray, T: np.ndarray,
                         translate: Optional[np.ndarray] = None,
                         scale: float = 1.0) -> np.ndarray:
    """4x4 world->camera matrix from COLMAP-style (R=C2W rotation, T=W2C
    translation); optional recentering of the camera center
    (reference getWorld2View2, graphics_utils.py:38-49)."""
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = T
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else translate
        C2W = np.linalg.inv(Rt)
        C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection, +z forward (reference graphics_utils.py:64-84)."""
    tan_x = math.tan(fovx * 0.5)
    tan_y = math.tan(fovy * 0.5)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


@struct.dataclass
class Camera:
    """Device-side camera. All array fields are f32 jnp arrays; height/width
    are static so the rasterizer specializes on image size."""

    view: jnp.ndarray        # [4,4] world -> camera
    full_proj: jnp.ndarray   # [4,4] projection @ view
    cam_pos: jnp.ndarray     # [3] camera center in world space
    tan_fovx: jnp.ndarray    # scalar
    tan_fovy: jnp.ndarray    # scalar
    height: int = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False)

    @property
    def focal_x(self) -> jnp.ndarray:
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> jnp.ndarray:
        return self.height / (2.0 * self.tan_fovy)

    @classmethod
    def create(
        cls,
        R: np.ndarray,
        T: np.ndarray,
        fovx: float,
        fovy: float,
        width: int,
        height: int,
        znear: float = 0.01,
        zfar: float = 100.0,
        translate: Optional[np.ndarray] = None,
        scale: float = 1.0,
    ) -> "Camera":
        view = world_to_view_matrix(R, T, translate, scale)
        proj = projection_matrix(znear, zfar, fovx, fovy)
        full = (proj @ view).astype(np.float32)
        cam_pos = np.linalg.inv(view)[:3, 3].astype(np.float32)
        return cls(
            view=jnp.asarray(view),
            full_proj=jnp.asarray(full),
            cam_pos=jnp.asarray(cam_pos),
            tan_fovx=jnp.float32(math.tan(fovx * 0.5)),
            tan_fovy=jnp.float32(math.tan(fovy * 0.5)),
            height=int(height),
            width=int(width),
        )

    def intrinsics_matrix(self) -> jnp.ndarray:
        """3x3 pinhole intrinsics K (pixel units, principal point at center)."""
        return jnp.array(
            [
                [self.focal_x, 0.0, self.width / 2.0],
                [0.0, self.focal_y, self.height / 2.0],
                [0.0, 0.0, 1.0],
            ],
            dtype=jnp.float32,
        )
