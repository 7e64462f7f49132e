"""High-throughput batch export: chunked lax.scan with checkpoint/resume.

The TPU-native export path (BASELINE.md config 5): frames are processed in
device-resident chunks via lax.scan of the SAME chain step used for live
preview, with the temporal state carried across chunks. The carried state (IIR
registers, rolling FFT window, prior Riesz pyramid) plus the frame cursor is
serializable, giving the checkpoint/resume capability the reference lacks for
long exports (SURVEY.md §5 "Checkpoint / resume").
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from live_video_magnification_tpu.models.chain import (
    MagnificationChain,
    _build_pre_stages,
    _build_step,
    parallel_clip_fn,
)
from live_video_magnification_tpu.models.params import ProcessorConfig

# Carried-state pytree format. Bumped whenever the state layout changes so an
# old checkpoint fails with a version error, not the misleading config-digest
# message (advisor round 4). v2 = the round-4 10-plane RieszState (shared
# accumulator; pre-round-4 checkpoints carried 12 planes/level).
STATE_FORMAT_VERSION = 2


class ClipProcessor:
    """Processor for [T, C, H, W] u8 chunks with carried state.

    time_parallel=False: lax.scan of the chain step (sequential over T).
    time_parallel=True: the sequence-parallel whole-chunk path — stateless
    stages vmapped over T, the mode's temporal recurrences as associative
    scans / window gathers (models/*.process_clip_parallel), with the SAME
    carried-state pytree so checkpoints and chunk boundaries are
    interchangeable between the two paths.
    """

    def __init__(self, cfg: ProcessorConfig, h: int, w: int, channels: int,
                 time_parallel: bool = False):
        self.cfg = cfg
        chain = MagnificationChain()
        self.key = chain.static_key(cfg, h, w, channels)
        self._step = _build_step(self.key)
        self._chain = chain  # for dynamic-param marshalling (butterworth etc.)
        self._dyn = chain._dyn_params(cfg, self.key)
        self.state = self._step.init_state()
        self.cursor = 0
        self.time_parallel = time_parallel

        if time_parallel:
            preprocess, _downscale, gray_stage = _build_pre_stages(self.key)
            par_fn = parallel_clip_fn(self.key)

            def chunk(state, frames, dyn):
                pre = jax.vmap(preprocess)(frames)
                magin = jax.vmap(gray_stage)(pre)
                if par_fn is None:
                    return state, (magin, pre)
                state, outs = par_fn(magin, dyn, state=state)
                return state, (outs, pre)

        else:
            raw_step = self._step.raw_fn

            def chunk(state, frames, dyn):
                def body(st, frame):
                    st2, processed, original = raw_step(st, frame, dyn)
                    return st2, (processed, original)

                return jax.lax.scan(body, state, frames)

        self._chunk_raw = chunk  # unjitted: the distributed exporter re-jits
        self._chunk = jax.jit(chunk, donate_argnums=(0,))

    def process_chunk(self, frames_u8: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """frames_u8: [T, C, H, W] u8. Returns (processed, original) stacks."""
        self.state, (processed, original) = self._chunk(
            self.state, jnp.asarray(frames_u8), self._dyn
        )
        self.cursor += frames_u8.shape[0]
        return np.asarray(processed), np.asarray(original)

    # -- checkpoint / resume --------------------------------------------------------------------

    def _config_digest(self) -> str:
        key_repr = repr(self.key) + repr(self.cfg)
        return hashlib.sha256(key_repr.encode()).hexdigest()[:16]

    def save_checkpoint(self, path: str) -> None:
        leaves, treedef = jax.tree.flatten(self.state)
        arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
        meta = json.dumps({"cursor": self.cursor, "digest": self._config_digest(),
                           "version": STATE_FORMAT_VERSION})
        np.savez(path, __meta__=np.frombuffer(meta.encode(), dtype=np.uint8), **arrays)

    def load_checkpoint(self, path: str) -> int:
        """Restores state; returns the frame cursor to resume from."""
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        meta = json.loads(bytes(data["__meta__"]).decode())
        # version gate BEFORE the digest gate: a layout change also changes
        # the digest, and "different configuration" would mislead the user
        # into hunting a config diff that doesn't exist
        found = meta.get("version", 1)
        if found != STATE_FORMAT_VERSION:
            raise ValueError(
                f"incompatible checkpoint state-format version (checkpoint "
                f"v{found}, this build writes v{STATE_FORMAT_VERSION}) — the "
                "carried-state layout changed; re-export from the start")
        if meta["digest"] != self._config_digest():
            raise ValueError("checkpoint was written for a different configuration")
        leaves, treedef = jax.tree.flatten(self.state)
        restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
        self.state = jax.tree.unflatten(treedef, restored)
        self.cursor = int(meta["cursor"])
        return self.cursor


def export_frames(
    frames_u8_tchw: np.ndarray,
    cfg: ProcessorConfig,
    chunk_size: int = 32,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    time_parallel: bool = False,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (processed, original) chunks for a [T, C, H, W] u8 clip."""
    t, c, h, w = frames_u8_tchw.shape
    proc = ClipProcessor(cfg, h, w, c, time_parallel=time_parallel)
    start = 0
    if checkpoint_path and os.path.exists(checkpoint_path + ".npz"):
        start = proc.load_checkpoint(checkpoint_path)
    done = start
    for i in range(start, t, chunk_size):
        chunk = frames_u8_tchw[i : i + chunk_size]
        yield proc.process_chunk(chunk)
        done += chunk.shape[0]
        if checkpoint_path and checkpoint_every and (done % checkpoint_every) < chunk_size:
            proc.save_checkpoint(checkpoint_path)
