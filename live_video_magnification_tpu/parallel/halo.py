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


# --------------------------------------------------------------- Pallas RDMA ring

_collective_counter = [0]


def _next_collective_id() -> int:
    _collective_counter[0] = (_collective_counter[0] + 1) % 32
    return _collective_counter[0]


def halo_exchange_cols_rdma(
    x_local, halo: int, axis_name: str, *,
    right_mode: str = "reflect", interpret: bool = False,
):
    """Column halo exchange via a Pallas make_async_remote_copy ring.

    The explicit-DMA alternative to lax.ppermute (the seam named in this
    module's round-1 docstring; SNIPPETS.md [1] pattern): each device RDMAs its
    edge strips directly into the neighbors' VMEM receive slots over ICI,
    with a neighbor barrier (skipped in interpret mode, where
    get_barrier_semaphore has no lowering) and per-call collective ids. The
    payoff over ppermute is scheduling control: the copy can overlap interior
    compute instead of being placed by XLA.

    x_local: [..., w_local] shard. Returns [..., w_local + 2*halo], with
    reflect-101 (or symmetric-right for the zero-injection quirk) at the
    global edges — identical semantics to
    parallel.riesz_sharded.halo_exchange_cols.

    Device addressing: compiled kernels use DeviceIdType.MESH with a
    {tile_axis: neighbor} dict (other mesh axes default to this device's own
    coordinate, so a batch axis composes for free). Interpret mode uses
    LOGICAL scalar ids — JAX's interpret-path dma_start only supports ONE
    named axis, so interpret tests must shard_map over the tile axis alone.
    """
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lead = x_local.shape[:-1]
    wl = x_local.shape[-1]
    rows = int(np.prod(lead)) if lead else 1
    x2 = x_local.reshape(rows, wl)

    def kernel(x_ref, left_out, right_out, recv, send_sem, recv_sem, *, barrier):
        n = lax.axis_size(axis_name)
        me = lax.axis_index(axis_name)
        left = lax.rem(me - 1 + n, n)
        right = lax.rem(me + 1, n)
        if interpret:
            id_type = pltpu.DeviceIdType.LOGICAL
            left_id, right_id = left, right
        else:
            id_type = pltpu.DeviceIdType.MESH
            left_id = {axis_name: left}
            right_id = {axis_name: right}
        if barrier:
            bar = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(bar, inc=1, device_id=left_id,
                                   device_id_type=id_type)
            pltpu.semaphore_signal(bar, inc=1, device_id=right_id,
                                   device_id_type=id_type)
            pltpu.semaphore_wait(bar, 2)
        # my right edge -> right neighbor's "from-left" slot; my left edge ->
        # left neighbor's "from-right" slot. SPMD symmetry pairs the recv
        # semaphores: wait() blocks on both my send and my matching recv.
        r1 = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[:, pl.ds(wl - halo, halo)],
            dst_ref=recv.at[0], send_sem=send_sem.at[0], recv_sem=recv_sem.at[0],
            device_id=right_id, device_id_type=id_type)
        r2 = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[:, pl.ds(0, halo)],
            dst_ref=recv.at[1], send_sem=send_sem.at[1], recv_sem=recv_sem.at[1],
            device_id=left_id, device_id_type=id_type)
        r1.start()
        r2.start()
        r1.wait()
        r2.wait()
        left_out[...] = recv[0]
        right_out[...] = recv[1]

    from_left, from_right = pl.pallas_call(
        functools.partial(kernel, barrier=not interpret),
        out_shape=(jax.ShapeDtypeStruct((rows, halo), x2.dtype),
                   jax.ShapeDtypeStruct((rows, halo), x2.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((2, rows, halo), x2.dtype),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(collective_id=_next_collective_id()),
        interpret=interpret,
    )(x2)

    from_left = from_left.reshape(lead + (halo,))
    from_right = from_right.reshape(lead + (halo,))
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    reflect_l = jnp.flip(x_local[..., 1 : halo + 1], axis=-1)
    if right_mode == "symmetric":
        reflect_r = jnp.flip(x_local[..., -halo:], axis=-1)
    else:
        reflect_r = jnp.flip(x_local[..., -halo - 1 : -1], axis=-1)
    left = jnp.where(idx == 0, reflect_l, from_left)
    right = jnp.where(idx == n - 1, reflect_r, from_right)
    return jnp.concatenate([left, x_local, right], axis=-1)


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
