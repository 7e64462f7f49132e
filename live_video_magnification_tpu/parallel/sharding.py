"""Frame-tile + batch sharding of the magnification step.

Builds a sharded, batched step for any mode: frames [B, C, H, W] are laid out
with B on the 'batch' mesh axis (data parallel over independent streams) and H
on the 'tile' axis (frame-tile parallel). The per-mode carried state is sharded
identically (leaf H dims on 'tile'), so streaming steps never reshard.

Collectives are placed by the XLA SPMD partitioner from these annotations:
  * the pyramid/Riesz stencils (shifted slices) -> halo collective-permutes,
  * global min-max rescales (color mode, u8 conversion) -> all-reduces,
over ICI. This is the BASELINE.json north-star layout: frame-tile sharded with
per-band amplification fully local.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from live_video_magnification_tpu.models import color as color_mode
from live_video_magnification_tpu.models import motion as motion_mode
from live_video_magnification_tpu.models import riesz as riesz_mode
from live_video_magnification_tpu.models.params import MagnificationMode


def _leaf_spec(leaf, batched: bool) -> P:
    """PartitionSpec for a state/IO leaf: batch on 'batch', the H (rows) dim on
    'tile'. Heuristic by rank relative to batching:
      scalars/counters -> replicated-over-tile, sharded on batch if batched.
    """
    nd = leaf.ndim
    if batched:
        if nd == 1:  # [B] counters
            return P("batch")
        if nd == 2:  # [B, W?] — not expected, replicate rows
            return P("batch", None)
        if nd == 3:  # [B, h, w] single-channel level
            return P("batch", "tile", None)
        if nd == 4:  # [B, C, h, w] or [B, T, h, w]-like: rows are dim 2
            return P("batch", None, "tile", None)
        if nd == 5:  # [B, T, C, h, w] color window
            return P("batch", None, None, "tile", None)
        return P("batch")
    else:
        if nd == 0 or nd == 1:
            return P()
        if nd == 2:
            return P("tile", None)
        if nd == 3:
            return P(None, "tile", None)
        if nd == 4:
            return P(None, None, "tile", None)
        return P()


def shard_batched_state(state, mesh: Mesh):
    """Device-put a batched state pytree with batch/tile shardings."""
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, _leaf_spec(leaf, True))),
        state,
    )


def build_sharded_step(
    mesh: Mesh,
    mode: MagnificationMode,
    batch: int,
    h: int,
    w: int,
    levels: int,
    framerate: float = 30.0,
    channels: int = 3,
    kernels: str | None = None,
) -> Tuple[Callable, object]:
    """Returns (jitted_step, sharded_init_state) for a batched, sharded mode step.

    jitted_step(state, frames_u8 [B,C,H,W], dyn) -> (state, outs [B,C,H,W]).
    dyn params are replicated (in_axes=None under vmap).

    Phase mode prefers the explicit shard_map path (Pallas MXU stencils on
    halo-exchanged W shards — parallel/riesz_sharded.py); frames/state then
    shard W on 'tile' instead of H. When the frame's level widths don't divide
    the mesh it falls back to this module's GSPMD jnp path (pallas_call is
    opaque to the SPMD partitioner). `kernels` forwards to the explicit path
    ('jnp' | 'pallas' | 'interpret'; None = auto by backend).
    """
    if mode is MagnificationMode.LAPLACE:
        single = partial(motion_mode.step, levels=levels)
        init = lambda: motion_mode.init_state(h, w, channels, levels)
    elif mode is MagnificationMode.COLOR:
        single = partial(color_mode.step, levels=levels, framerate=framerate)
        init = lambda: color_mode.init_state(h, w, channels, levels, framerate)
    elif mode is MagnificationMode.PHASE:
        from live_video_magnification_tpu.parallel.riesz_sharded import (
            build_sharded_riesz_step,
            make_plan,
        )

        if make_plan(h, w, levels, mesh.shape["tile"]).sharded[0]:
            return build_sharded_riesz_step(mesh, batch, h, w, levels, kernels=kernels)
        # GSPMD fallback: jnp stencils, XLA places the halo exchange.
        single = partial(riesz_mode.step, levels=levels, use_pallas=False)
        init = lambda: riesz_mode.init_state(h, w, levels)
    else:
        raise ValueError(f"no sharded step for mode {mode}")

    batched = jax.vmap(single, in_axes=(0, 0, None))

    state0 = jax.vmap(lambda _: init())(jnp.arange(batch))
    state_shardings = jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, True)), state0
    )
    frame_sharding = NamedSharding(mesh, P("batch", None, "tile", None))
    state_sharded = jax.tree.map(jax.device_put, state0, state_shardings)

    jitted = jax.jit(
        batched,
        in_shardings=(state_shardings, frame_sharding, None),
        out_shardings=(state_shardings, frame_sharding),
        donate_argnums=(0,),
    )
    return jitted, state_sharded
