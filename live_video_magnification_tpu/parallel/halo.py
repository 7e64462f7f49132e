"""Explicit halo exchange for row-sharded stencils (shard_map + ppermute).

The GSPMD path (parallel/sharding.py) lets XLA place halo communication; this
module is the explicit alternative for when the schedule must be controlled:
neighbor edge strips move via lax.ppermute (ICI collective-permutes), global
edges reflect-101 locally, and the conv runs on the haloed strip. This is the
BASELINE.json north-star layout in its explicit form (frame-tile sharding with
boundary state exchanged over ICI), and the seam where a Pallas
make_async_remote_copy ring (SNIPPETS.md [1] pattern) can later replace the
XLA collective to overlap the exchange with interior compute.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from live_video_magnification_tpu.ops.conv import _shifted_taps_sum


def halo_exchange_rows(x_local: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """[h_local, ...] row shard -> [h_local + 2*halo, ...] with neighbor halos.

    Interior boundaries receive real neighbor rows (ppermute); the global top and
    bottom use local reflect-101, exactly matching an unsharded reflect-pad.
    Requires h_local > halo.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    down_perm = [(i, i + 1) for i in range(n - 1)]   # my bottom rows -> next shard's top halo
    up_perm = [(i, i - 1) for i in range(1, n)]      # my top rows -> previous shard's bottom halo

    from_above = lax.ppermute(x_local[-halo:], axis_name, down_perm)
    from_below = lax.ppermute(x_local[:halo], axis_name, up_perm)

    reflect_top = jnp.flip(x_local[1 : halo + 1], axis=0)
    reflect_bot = jnp.flip(x_local[-halo - 1 : -1], axis=0)

    top = jnp.where(idx == 0, reflect_top, from_above)
    bot = jnp.where(idx == n - 1, reflect_bot, from_below)
    return jnp.concatenate([top, x_local, bot], axis=0)


def sharded_correlate2d(x_local: jnp.ndarray, kernel, axis_name: str) -> jnp.ndarray:
    """Row-sharded dense 2-D correlation with reflect-101 global borders.

    x_local: [h_local, w] shard of a [H, w] array sharded over `axis_name`.
    Column handling is local (reflect pad); rows use halo exchange.
    """
    k = np.asarray(kernel, dtype=np.float64)
    kh, kw = k.shape
    rh, rw = kh // 2, kw // 2
    h_local, w = x_local.shape[-2], x_local.shape[-1]

    haloed = halo_exchange_rows(x_local, rh, axis_name)
    padded = jnp.pad(haloed, [(0, 0)] * (haloed.ndim - 1) + [(rw, rw)], mode="reflect")
    acc = None
    for i in range(kh):
        row = lax.slice_in_dim(padded, i, i + h_local, axis=padded.ndim - 2)
        term = _shifted_taps_sum(row, k[i].tolist(), axis=row.ndim - 1, out_len=w)
        acc = term if acc is None else acc + term
    return acc


def make_sharded_conv(mesh, axis_name: str, kernel):
    """jit-ready f(x[H, W]) running the conv row-sharded over `axis_name`."""
    from jax.sharding import PartitionSpec as P

    def fn(x):
        return jax.shard_map(
            lambda xl: sharded_correlate2d(xl, kernel, axis_name),
            mesh=mesh,
            in_specs=P(axis_name, None),
            out_specs=P(axis_name, None),
        )(x)

    return jax.jit(fn)
