"""Device mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("batch", "tile"),
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    Default factorization puts as many devices as possible on 'tile' (spatial
    rows — the latency axis) and the remainder on 'batch'.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (n,)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    return Mesh(np.asarray(devices).reshape(shape), axis_names)
