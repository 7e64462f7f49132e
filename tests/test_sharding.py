"""Multi-device sharding tests on the virtual 8-CPU mesh.

SURVEY.md §4(d): sharded must equal single-device within tolerance — here one
u8 LSB (the SPMD partitioner may reassociate float reductions).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from live_video_magnification_tpu.models import color as color_mode
from live_video_magnification_tpu.models import motion as motion_mode
from live_video_magnification_tpu.models import riesz as riesz_mode
from live_video_magnification_tpu.models.params import MagnificationMode, motion_hz_to_blend
from live_video_magnification_tpu.parallel.mesh import make_mesh
from live_video_magnification_tpu.parallel.sharding import build_sharded_step

from oracle import synthetic_clip

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def assert_u8_close(a, b, max_lsb=1):
    """Sharded == single-device within one u8 LSB: the SPMD partitioner may
    reassociate float reductions, shifting rounding on a handful of pixels."""
    d = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert d.max() <= max_lsb, f"max diff {d.max()} LSB on {(d > max_lsb).sum()} px"

FPS = 30.0


def _frames(batch, t, h, w):
    clips = []
    for b in range(batch):
        clip = synthetic_clip(t, h, w, color=True, seed=100 + b)
        clips.append(np.stack([np.moveaxis(f, -1, 0) for f in clip]))
    return np.stack(clips)  # [B, T, C, H, W]


def _riesz_dyn(levels):
    import math

    from live_video_magnification_tpu.ops.temporal import butterworth_bandpass_coeffs

    b_lo, a_lo = butterworth_bandpass_coeffs(0.5, FPS)
    b_hi, a_hi = butterworth_bandpass_coeffs(3.0, FPS)
    return riesz_mode.RieszDynParams(
        jnp.float32(30.0), jnp.float32(0.5 * math.pi),
        jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32),
        jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32),
        jnp.asarray(False), jnp.asarray(False),
    )


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_riesz_equals_single_device(mesh_shape):
    batch, t, h, w, levels = 2, 4, 64, 64, 3
    frames = _frames(batch, t, h, w)
    dyn = _riesz_dyn(levels)
    mesh = make_mesh(mesh_shape, ("batch", "tile"))
    step, state = build_sharded_step(mesh, MagnificationMode.PHASE, batch, h, w, levels, FPS)

    # single-device reference: plain per-stream stepping
    ref_states = [riesz_mode.init_state(h, w, levels) for _ in range(batch)]
    for ti in range(t):
        outs_ref = []
        for b in range(batch):
            ref_states[b], o = riesz_mode.step(
                ref_states[b], jnp.asarray(frames[b, ti]), dyn, levels=levels
            )
            outs_ref.append(np.asarray(o))
        state, out = step(state, jnp.asarray(frames[:, ti]), dyn)
        assert_u8_close(np.asarray(out), np.stack(outs_ref))


def test_sharded_color_equals_single_device():
    batch, t, h, w, levels = 2, 5, 64, 64, 2
    frames = _frames(batch, t, h, w)
    dyn = color_mode.ColorDynParams(jnp.float32(80.0), jnp.float32(0.8), jnp.float32(1.5))
    mesh = make_mesh((2, 4), ("batch", "tile"))
    step, state = build_sharded_step(mesh, MagnificationMode.COLOR, batch, h, w, levels, FPS)

    ref_states = [color_mode.init_state(h, w, 3, levels, FPS) for _ in range(batch)]
    for ti in range(t):
        outs_ref = []
        for b in range(batch):
            ref_states[b], o = color_mode.step(
                ref_states[b], jnp.asarray(frames[b, ti]), dyn, levels=levels, framerate=FPS
            )
            outs_ref.append(np.asarray(o))
        state, out = step(state, jnp.asarray(frames[:, ti]), dyn)
        assert_u8_close(np.asarray(out), np.stack(outs_ref))


def test_sharded_motion_equals_single_device():
    batch, t, h, w, levels = 2, 4, 64, 64, 3
    frames = _frames(batch, t, h, w)
    dyn = motion_mode.MotionDynParams(
        jnp.float32(15.0), jnp.float32(300.0),
        jnp.float32(motion_hz_to_blend(1.0, FPS)),
        jnp.float32(motion_hz_to_blend(3.0, FPS)),
        jnp.float32(0.5),
    )
    mesh = make_mesh((2, 4), ("batch", "tile"))
    step, state = build_sharded_step(mesh, MagnificationMode.LAPLACE, batch, h, w, levels, FPS)

    ref_states = [motion_mode.init_state(h, w, 3, levels) for _ in range(batch)]
    for ti in range(t):
        outs_ref = []
        for b in range(batch):
            ref_states[b], o = motion_mode.step(
                ref_states[b], jnp.asarray(frames[b, ti]), dyn, levels=levels
            )
            outs_ref.append(np.asarray(o))
        state, out = step(state, jnp.asarray(frames[:, ti]), dyn)
        assert_u8_close(np.asarray(out), np.stack(outs_ref))


@pytest.mark.parametrize("mesh_shape,levels", [((2, 4), 3), ((1, 8), 3)])
def test_explicit_riesz_shard_map_equals_single_device(mesh_shape, levels):
    """The explicit shard_map path (parallel/riesz_sharded.py, jnp kernels):
    halo-exchanged W shards + replicated small levels == per-stream stepping."""
    from live_video_magnification_tpu.parallel.riesz_sharded import (
        build_sharded_riesz_step,
        make_plan,
    )

    batch, t, h, w = 2, 3, 64, 256
    n = mesh_shape[1]
    plan = make_plan(h, w, levels, n)
    assert plan.sharded[0], "test dims must lane-shard at level 0"
    frames = _frames(batch, t, h, w)
    dyn = _riesz_dyn(levels)
    mesh = make_mesh(mesh_shape, ("batch", "tile"))
    step, state = build_sharded_riesz_step(mesh, batch, h, w, levels, kernels="jnp")

    ref_states = [riesz_mode.init_state(h, w, levels) for _ in range(batch)]
    for ti in range(t):
        outs_ref = []
        for b in range(batch):
            ref_states[b], o = riesz_mode.step(
                ref_states[b], jnp.asarray(frames[b, ti]), dyn, levels=levels
            )
            outs_ref.append(np.asarray(o))
        state, out = step(state, jnp.asarray(frames[:, ti]), dyn)
        assert_u8_close(np.asarray(out), np.stack(outs_ref))


@pytest.mark.parametrize("tail", ["jnp", "pallas", "mxu"])
def test_explicit_riesz_pallas_interpret_equals_single_device(tail):
    """Same path with the actual Pallas MXU kernels (interpret mode) inside
    shard_map — VERDICT round-1 item 2's done-criterion. All three tail
    kernels (jnp blur default / VPU riesz_amplify_fused / MXU-banded
    riesz_amplify_mxu) must agree with the unsharded step."""
    from live_video_magnification_tpu.parallel.riesz_sharded import (
        build_sharded_riesz_step,
        make_plan,
    )

    batch, t, h, w, levels = 1, 2, 64, 256, 2
    mesh = make_mesh((1, 8), ("batch", "tile"))
    assert make_plan(h, w, levels, 8).fully_sharded
    frames = _frames(batch, t, h, w)
    dyn = _riesz_dyn(levels)
    step, state = build_sharded_riesz_step(mesh, batch, h, w, levels,
                                           kernels="interpret", tail=tail)

    ref_state = riesz_mode.init_state(h, w, levels)
    for ti in range(t):
        ref_state, o = riesz_mode.step(
            ref_state, jnp.asarray(frames[0, ti]), dyn, levels=levels
        )
        state, out = step(state, jnp.asarray(frames[:, ti]), dyn)
        assert_u8_close(np.asarray(out[0]), np.asarray(o))


def test_explicit_riesz_fused_build_path_equals_single_device(monkeypatch):
    """Force the fused VPU build branch of the sharded step (used on TPU for
    sub-MXU levels) by disabling the MXU gate; interpret kernels, 8-way mesh."""
    from live_video_magnification_tpu.parallel import riesz_sharded as rs

    monkeypatch.setattr(rs._Ops, "_pallas_ok", lambda self, h, w: False)
    batch, t, h, w, levels = 1, 2, 64, 256, 2
    mesh = make_mesh((1, 8), ("batch", "tile"))
    frames = _frames(batch, t, h, w)
    dyn = _riesz_dyn(levels)
    step, state = rs.build_sharded_riesz_step(mesh, batch, h, w, levels,
                                              kernels="interpret")
    ref_state = riesz_mode.init_state(h, w, levels)
    for ti in range(t):
        ref_state, o = riesz_mode.step(
            ref_state, jnp.asarray(frames[0, ti]), dyn, levels=levels
        )
        state, out = step(state, jnp.asarray(frames[:, ti]), dyn)
        assert_u8_close(np.asarray(out[0]), np.asarray(o))


def test_rdma_halo_exchange_matches_ppermute():
    """parallel/halo.py make_async_remote_copy ring == the ppermute exchange
    (both edge modes), interpret mode on the 8-device mesh."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from live_video_magnification_tpu.parallel.halo import halo_exchange_cols_rdma
    from live_video_magnification_tpu.parallel.riesz_sharded import halo_exchange_cols

    mesh = make_mesh((8,), ("tile",))
    x = jnp.asarray(np.random.default_rng(5).random((3, 16, 64)).astype(np.float32))
    for right_mode in ("reflect", "symmetric"):
        ref_fn = jax.jit(jax.shard_map(
            partial(halo_exchange_cols, halo=4, axis_name="tile", right_mode=right_mode),
            mesh=mesh, in_specs=P(None, None, "tile"),
            out_specs=P(None, None, "tile"), check_vma=False))
        got_fn = jax.jit(jax.shard_map(
            partial(halo_exchange_cols_rdma, halo=4, axis_name="tile",
                    right_mode=right_mode, interpret=True),
            mesh=mesh, in_specs=P(None, None, "tile"),
            out_specs=P(None, None, "tile"), check_vma=False))
        np.testing.assert_array_equal(np.asarray(ref_fn(x)), np.asarray(got_fn(x)))


def test_explicit_riesz_rdma_halo_equals_single_device():
    """The full sharded step with the Pallas RDMA ring halo (interpret) —
    the SNIPPETS.md [1] seam built and verified."""
    from live_video_magnification_tpu.parallel.riesz_sharded import (
        build_sharded_riesz_step,
    )

    # Tile-only mesh: JAX's interpret-mode dma_start supports a single named
    # axis; compiled kernels use MESH-dict device ids and compose with 'batch'.
    batch, t, h, w, levels = 1, 2, 64, 256, 2
    mesh = make_mesh((8,), ("tile",))
    frames = _frames(batch, t, h, w)
    dyn = _riesz_dyn(levels)
    step, state = build_sharded_riesz_step(mesh, batch, h, w, levels,
                                           kernels="interpret", halo_impl="rdma")
    ref_state = riesz_mode.init_state(h, w, levels)
    for ti in range(t):
        ref_state, o = riesz_mode.step(
            ref_state, jnp.asarray(frames[0, ti]), dyn, levels=levels
        )
        state, out = step(state, jnp.asarray(frames[:, ti]), dyn)
        assert_u8_close(np.asarray(out[0]), np.asarray(o))


def test_explicit_riesz_band_parallel_equals_single_device():
    """Pyramid-band (level) parallelism (SURVEY §2.9, VERDICT round-3 item 5):
    replicated small levels owned round-robin per device (lax.cond skip +
    psum replicate) == per-stream stepping. W=192 forces replication from
    level 1 on the 8-way mesh, so the banded path actually executes."""
    from live_video_magnification_tpu.parallel.riesz_sharded import (
        build_sharded_riesz_step,
        make_plan,
    )

    batch, t, h, w, levels = 1, 3, 64, 192, 3
    plan = make_plan(h, w, levels, 8)
    assert plan.sharded[0] and not plan.sharded[1], "need a replicated level"
    mesh = make_mesh((1, 8), ("batch", "tile"))
    frames = _frames(batch, t, h, w)
    dyn = _riesz_dyn(levels)
    step, state = build_sharded_riesz_step(mesh, batch, h, w, levels,
                                           kernels="jnp", band_parallel=True)
    ref_state = riesz_mode.init_state(h, w, levels)
    for ti in range(t):
        ref_state, o = riesz_mode.step(
            ref_state, jnp.asarray(frames[0, ti]), dyn, levels=levels
        )
        state, out = step(state, jnp.asarray(frames[:, ti]), dyn)
        assert_u8_close(np.asarray(out[0]), np.asarray(o))


def test_explicit_riesz_mesh_of_one_keeps_pallas_path():
    """Mesh of 1: the explicit path degenerates to the plain Pallas kernels
    (no collectives), bit-matching the single-device step — the single-chip
    bench runs this exact code path."""
    from live_video_magnification_tpu.parallel.riesz_sharded import (
        build_sharded_riesz_step,
    )

    batch, t, h, w, levels = 1, 2, 48, 64, 2
    mesh = make_mesh((1, 1), ("batch", "tile"), devices=jax.devices()[:1])
    frames = _frames(batch, t, h, w)
    dyn = _riesz_dyn(levels)
    # default: degenerate plan (replicate-everything = the unsharded kernels);
    # force_sharded keeps the halo machinery at n==1 — both must bit-match.
    for force in (False, True):
        step, state = build_sharded_riesz_step(mesh, batch, h, w, levels,
                                               kernels="jnp",
                                               force_sharded=force)
        ref_state = riesz_mode.init_state(h, w, levels)
        for ti in range(t):
            ref_state, o = riesz_mode.step(
                ref_state, jnp.asarray(frames[0, ti]), dyn, levels=levels
            )
            state, out = step(state, jnp.asarray(frames[:, ti]), dyn)
            assert_u8_close(np.asarray(out[0]), np.asarray(o), max_lsb=0)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_explicit_halo_conv_matches_unsharded():
    """parallel/halo.py: ppermute halo exchange + reflect-101 edges == full conv."""
    from live_video_magnification_tpu.ops.conv import correlate2d
    from live_video_magnification_tpu.ops.kernels import RIESZ_HIGHPASS_9x9
    from live_video_magnification_tpu.parallel.halo import make_sharded_conv

    mesh = make_mesh((8,), ("tile",))
    h, w = 128, 96  # 16 rows per shard > halo of 4
    x = jnp.asarray(np.random.default_rng(8).random((h, w)).astype(np.float32))
    ref = np.asarray(correlate2d(x, RIESZ_HIGHPASS_9x9))
    fn = make_sharded_conv(mesh, "tile", RIESZ_HIGHPASS_9x9)
    got = np.asarray(fn(x))
    np.testing.assert_allclose(got, ref, atol=3e-5)
