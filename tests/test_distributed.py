"""Multi-host scaffolding mechanics on the virtual 8-device mesh.

Real DCN scaling needs a pod slice; these verify the bring-up no-op path, the
global mesh construction, and that the scaling-efficiency harness runs the
sharded step end-to-end on 1 vs N devices (the numbers themselves are
meaningless on virtual CPU devices — the harness is the deliverable)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from live_video_magnification_tpu.parallel import distributed
from live_video_magnification_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def test_initialize_is_noop_single_process(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    monkeypatch.delenv("LVMT_DISTRIBUTED", raising=False)
    assert distributed.initialize() is False


def test_global_mesh_shapes():
    mesh = distributed.global_mesh(("batch", "tile"))
    assert mesh.shape == {"batch": 1, "tile": 8}
    mesh = distributed.global_mesh(("batch", "tile"), tile_per_host=True)
    # single process: hosts axis is 1
    assert mesh.shape == {"batch": 1, "tile": 8}


def test_scaling_harness_runs_sharded_phase_step():
    from live_video_magnification_tpu.models.params import MagnificationMode
    from live_video_magnification_tpu.parallel.sharding import build_sharded_step

    h, w, levels = 64, 256, 2
    from test_sharding import _riesz_dyn

    dyn = _riesz_dyn(levels)
    frames = jnp.asarray(
        np.random.default_rng(3).integers(0, 255, (1, 3, h, w), dtype=np.uint8)
    )

    def build(mesh):
        return build_sharded_step(mesh, MagnificationMode.PHASE, 1, h, w, levels,
                                  30.0, kernels="jnp")

    def inputs(mesh):
        return (frames, dyn)

    r = distributed.measure_scaling_efficiency(build, inputs, steps=3)
    assert r["devices"] == 8
    assert r["fps_1"] > 0 and r["fps_n"] > 0
    assert 0 < r["efficiency"]  # mechanics only; CPU-mesh numbers not meaningful
