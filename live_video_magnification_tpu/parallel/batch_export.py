"""BASELINE config 5 end-to-end: the N-host distributed batch-export program.

The reference's export is a single worker thread feeding frames strictly in
order through one fixed-config chain (Exporter.cpp:202-207). The TPU-native
distributed form keeps those semantics — fixed config for the whole file,
frames ordered in the output — while sharding the TIME axis over every chip
of every host (VERDICT round-3 item 3):

  per host:  decode ONLY the frame rows of this chunk that its own devices
             shard (addressable-shard index map — no host decodes the whole
             clip)                                             [host CPU]
  global:    ONE T-sharded jitted call of the sequence-parallel clip function
             (models/*.process_clip_parallel): every per-frame stage vmapped,
             the temporal recurrences as associative scans that XLA splits
             into local scans + shard-boundary combines over ICI/DCN — the
             IIR/window carry handoff between neighbor shards IS those
             combines, not hand-written messages              [TPU, SPMD]
  per host:  encode its own addressable output shards into per-(chunk, shard)
             part files                                        [host CPU]
  coordinator: concatenate the parts in (chunk, shard) order → ONE file.

The carried state (prior pyramid, DF-II registers / rolling window) crosses
chunk boundaries exactly as in the single-process ClipProcessor, so a
distributed export, a --time-parallel export, and a sequential export are
interchangeable mid-stream (same pytree; checkpoints compatible). A final
partial chunk (fewer frames than the mesh is wide) runs through the same
clip function unsharded.

Single-process emulation: on one host the same program runs over the local
device mesh (the 8-device virtual CPU mesh in tests; the driver's
dryrun_multichip covers the compile + execute of the sharded call).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from live_video_magnification_tpu.export.batch import ClipProcessor
from live_video_magnification_tpu.models.params import ProcessorConfig
from live_video_magnification_tpu.parallel.mesh import make_mesh


class DistributedClipExporter:
    """T-sharded chunk processor with carried state (config-5 compute core).

    mesh: 1-axis ("time",) mesh over the devices to shard the frame axis on;
    default = every device visible to this runtime (all hosts' chips).
    """

    def __init__(self, cfg: ProcessorConfig, h: int, w: int, channels: int,
                 mesh: Optional[Mesh] = None):
        if mesh is None:
            mesh = make_mesh((len(jax.devices()),), ("time",))
        assert len(mesh.axis_names) == 1, "batch_export shards one (time) axis"
        self.mesh = mesh
        self.n_shards = int(np.prod(mesh.devices.shape))
        self.proc = ClipProcessor(cfg, h, w, channels, time_parallel=True)
        self._dyn = self.proc._dyn

        axis = mesh.axis_names[0]
        self._frames_sharding = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())
        self._repl = repl
        state_sh = jax.tree.map(lambda _: repl, self.proc.state)
        self._sharded_chunk = jax.jit(
            self.proc._chunk_raw,
            in_shardings=(state_sh, self._frames_sharding, None),
            out_shardings=(state_sh,
                           (self._frames_sharding, self._frames_sharding)),
            donate_argnums=(0,),
        )
        # The final partial chunk runs the SAME clip fn with the frames
        # REPLICATED over the same global mesh — a plain jit would place the
        # host-local array on this host's devices only and fail against the
        # mesh-committed carry state on multi-host (code-review round 4).
        self._plain_chunk = jax.jit(
            self.proc._chunk_raw,
            in_shardings=(state_sh, repl, None),
            out_shardings=(state_sh, (repl, repl)),
            donate_argnums=(0,),
        )
        self._state_sh = state_sh
        self.state = jax.device_put(self.proc.state, state_sh)
        self.cursor = 0

    # -- checkpoint / resume (interchangeable with ClipProcessor's) ------------------------------

    def save_checkpoint(self, path: str) -> None:
        """Same .npz format + config digest as ClipProcessor: a distributed
        checkpoint resumes a sequential export and vice versa (the carried
        state pytree is identical)."""
        self.proc.state = jax.tree.map(np.asarray, self.state)
        self.proc.cursor = self.cursor
        self.proc.save_checkpoint(path)

    def load_checkpoint(self, path: str) -> int:
        cursor = self.proc.load_checkpoint(path)
        self.state = jax.device_put(self.proc.state, self._state_sh)
        self.cursor = cursor
        return cursor

    # -- host-side shard bookkeeping ------------------------------------------------------------

    def local_rows(self, chunk_len: int) -> List[Tuple[int, int, int]]:
        """The (shard_index, row_start, row_end) triples of `chunk_len` frames
        that THIS process's devices own — the rows this host must decode and
        the output segments it must encode. Rows are chunk-relative."""
        assert chunk_len % self.n_shards == 0, (
            f"local_rows needs a shard-divisible chunk (got {chunk_len} over "
            f"{self.n_shards} shards); partial tails take the replicated path "
            "in process_chunk / export_video_distributed")
        shape = (chunk_len,)
        idx_map = self._frames_sharding.addressable_devices_indices_map(shape)
        out = []
        per = chunk_len // self.n_shards
        for dev, idx in idx_map.items():
            sl = idx[0]
            start = sl.start or 0
            stop = sl.stop if sl.stop is not None else chunk_len
            out.append((start // per, start, stop))
        out.sort()
        return out

    # -- processing -----------------------------------------------------------------------------

    def process_chunk(self, frames_u8_local: np.ndarray, chunk_len: int,
                      timings: Optional[dict] = None,
                      fetch_original: bool = True):
        """Process one global chunk of `chunk_len` frames.

        frames_u8_local: [T_local, C, H, W] u8 — the concatenation of this
        process's owned rows (local_rows order). Returns (processed, original)
        as [T_local, ...] arrays covering the SAME rows (fetch is local: only
        addressable shards are materialized on this host).

        timings, if given, accumulates {"process_s", "fetch_s"} busy seconds,
        split by a device-side checksum sync between dispatch and fetch (the
        only valid compute barrier behind the relay — bench.py protocol);
        without it, no extra device op runs and the fetch synchronizes.

        fetch_original=False returns (processed, None) and skips the
        device->host transfer of the pre-magnification plane entirely —
        HALF the d2h bytes. The exporter uses it whenever split mode doesn't
        need the original pane (the default export).
        """
        import time as _time

        t0 = _time.monotonic()
        partial = chunk_len % self.n_shards != 0
        sharding = self._repl if partial else self._frames_sharding
        if jax.process_count() == 1:
            garr = jax.device_put(jnp.asarray(frames_u8_local), sharding)
        else:
            shape = (frames_u8_local.shape if partial
                     else (chunk_len,) + frames_u8_local.shape[1:])
            garr = jax.make_array_from_process_local_data(
                sharding, frames_u8_local, shape)
        if timings is not None:
            # split the host->device upload out of "process": behind the
            # relay the upload is tunnel-bound (~170 ms per 1080p frame
            # measured) and would otherwise masquerade as compute
            _checksum_sync(garr)
            t_h2d = _time.monotonic()
            timings["h2d_s"] = timings.get("h2d_s", 0.0) + (t_h2d - t0)
            timings.setdefault("h2d_chunks", []).append(t_h2d - t0)
            t0 = t_h2d
        chunk_fn = self._plain_chunk if partial else self._sharded_chunk
        self.state, (outs, pre) = chunk_fn(self.state, garr, self._dyn)
        self.cursor += chunk_len
        if timings is not None:
            _checksum_sync(outs)
            t1 = _time.monotonic()
            timings["process_s"] = timings.get("process_s", 0.0) + (t1 - t0)
            timings.setdefault("process_chunks", []).append(t1 - t0)

        def local(arr):
            # replicated (the partial tail) or single-shard: materialize
            # directly — every addressable shard IS the full/only slice, and
            # the concat below would duplicate rows
            if (arr.sharding.is_fully_replicated
                    or len(arr.addressable_shards) == 1):
                return np.asarray(arr)
            shards = sorted(arr.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

        out = local(outs), (local(pre) if fetch_original else None)
        if timings is not None:
            timings["fetch_s"] = (timings.get("fetch_s", 0.0)
                                  + (_time.monotonic() - t1))
        return out


def _checksum_sync(out) -> None:
    """Device-side scalar checksum + 4-byte readback: the only timing barrier
    that works behind the axon relay (block_until_ready returns at dispatch;
    a full fetch would measure the ~320 KB/s tunnel, not compute)."""
    leaf = jax.tree.leaves(out)[0]
    s = jax.jit(lambda x: jnp.sum(x.ravel()[:: max(1, x.size // 64)]
                                  .astype(jnp.float32)))(leaf)
    float(s)


def export_video_distributed(
    input_path: str,
    output_path: str,
    cfg: ProcessorConfig,
    mesh: Optional[Mesh] = None,
    chunk: int = 32,
    file_fps: Optional[float] = None,
    start: int = 0,
    end: Optional[int] = None,
    keep_parts: bool = False,
    split=None,                 # SplitMode; None/NONE = processed only
    labels: bool = False,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    stats: Optional[dict] = None,
    prefetch: bool = True,
    decode_workers: int = 2,
) -> str:
    """The config-5 program, single entry point (every process calls this with
    the same arguments; the coordinator returns the final path).

    Decode→shard→process→encode per chunk; part files named
    `<out>.c<chunk>s<shard><ext>` so the coordinator's concat order —
    (chunk, shard) — is the global frame order. Returns the final output path
    on process 0 (other processes return their last part path).

    prefetch=True (default) overlaps the host stages with the device: a pool
    of `decode_workers` threads decodes upcoming chunks concurrently (chunk
    decodes are independent re-decodes at different offsets; the round-5
    stage split measured single-threaded cv2 decode as the end-to-end
    ceiling — 72/309 ms per 1080p/4K frame vs 12/63 ms compute), and an
    encode thread drains finished chunks into part files — the pipeline
    pattern of the live engine (BoundedQueue semantics, ProcessingChain.hpp
    frames-in-order invariant: chunks still hit the device strictly in
    order; only the host IO runs concurrently). prefetch=False is the serial
    reference path (bit-identical output; used for the stage-split A/B).

    split/labels compose original|processed panes exactly like the GUI export
    (Exporter.cpp:53-88 semantics). checkpoint_path enables resume: the
    checkpoint format is ClipProcessor's (config-digest guarded), so a
    distributed export can resume a sequential one and vice versa; completed
    chunks' part files are reused, only the remainder is processed. A
    checkpoint is only written after its chunks' part files are on disk
    (the encode queue drains first), so resume always finds the parts it
    skips.

    stats, if given, is filled with {"frames": N} — frames actually through
    the processor this export (== end-start at completion), the number the
    CLI reports (container frame counts can lie — advisor round 4) — plus
    per-stage busy seconds {"decode_s", "process_s", "fetch_s", "encode_s",
    "concat_s", "wall_s"} for the config-5 stage split (process/fetch are
    separated by a device checksum sync; on the axon relay the fetch figure
    is tunnel bandwidth, not production PCIe)."""
    from live_video_magnification_tpu.export.exporter import compose
    from live_video_magnification_tpu.export.types import SplitMode
    from live_video_magnification_tpu.io.video import (
        concat_videos,
        iter_video,
        video_info,
        VideoWriterStream,
    )

    split = split or SplitMode.NONE

    total, h, w, fps = video_info(input_path)
    probe = next(iter_video(input_path, start, start + 1), None)
    if probe is None:
        raise IOError(f"no frames decoded from {input_path}")
    channels = 1 if probe.ndim == 2 else probe.shape[2]
    h, w = probe.shape[0], probe.shape[1]
    end = end if end is not None else (total or None)
    if end is None:
        raise ValueError("distributed export needs a known frame count")

    exp = DistributedClipExporter(cfg, h, w, channels, mesh=mesh)
    n = exp.n_shards
    chunk = max(n, (chunk // n) * n)
    out_fps = file_fps or fps
    base, ext = os.path.splitext(output_path)
    rank = jax.process_index()

    resume_at = start
    if checkpoint_path and os.path.exists(checkpoint_path + ".npz"):
        resume_at = start + exp.load_checkpoint(checkpoint_path)

    import queue as _queue
    import threading
    import time as _time

    t_wall0 = _time.monotonic()
    timings: dict = {}

    # chunk plan, built up front so the decode prefetcher and the main loop
    # walk the same schedule: (ci, pos, clen, rows, partial)
    part_paths: List[Tuple[int, int, str]] = []  # (chunk_index, shard, path)
    expected: List[Tuple[int, int, str]] = []    # ALL parts this run produces
    plan = []
    ci = 0
    pos = start
    while pos < end:
        clen = min(chunk, end - pos)
        partial = clen % n != 0
        if not partial:
            rows = exp.local_rows(clen)
            for sh in range(n):
                expected.append((ci, sh, f"{base}.c{ci:04d}s{sh:03d}{ext}"))
        else:  # partial tail: every process decodes + processes the remainder
            rows = [(0, 0, clen)]
            expected.append((ci, 0, f"{base}.c{ci:04d}s{0:03d}{ext}"))
        if pos + clen > resume_at:
            plan.append((ci, pos, clen, rows, partial))
        # else: completed before the checkpoint — the part files already
        # exist (checkpoints are written only after their parts are on disk);
        # reuse them, skip decode + compute entirely
        pos += clen
        ci += 1

    t_lock = threading.Lock()

    def _acc(key: str, dt: float) -> None:
        with t_lock:  # decode runs in a pool: same-key accumulation races
            timings[key] = timings.get(key, 0.0) + dt
            timings.setdefault(key[:-2] + "_chunks", []).append(dt)

    def decode_chunk(item) -> np.ndarray:
        _ci, cpos, _clen, rows, _partial = item
        t0 = _time.monotonic()
        frames = []
        for _sh, a, b in rows:
            frames.extend(
                f if f.ndim == 3 else f[..., None]
                for f in iter_video(input_path, cpos + a, cpos + b)
            )
        want = sum(b - a for _sh, a, b in rows)
        if len(frames) != want:
            # containers lie about frame counts (video_info documents this);
            # fail HERE with the cause rather than as a shape mismatch deep
            # in the SPMD call
            raise IOError(
                f"decoder returned {len(frames)} of {want} frames for chunk "
                f"{_ci} at {cpos} — the container's frame count is wrong; "
                "pass an explicit end= within the decodable range")
        local = np.ascontiguousarray(
            np.moveaxis(np.stack(frames), -1, 1))  # [T_local, C, H, W]
        _acc("decode_s", _time.monotonic() - t0)
        return local

    def encode_chunk(item, processed: np.ndarray, original: np.ndarray):
        _ci, _cpos, clen, rows, partial = item
        t0 = _time.monotonic()
        off = 0
        for sh, a, b in rows:
            seg = processed[off : off + (b - a)]
            orig_seg = (original[off : off + (b - a)]
                        if original is not None else None)
            off += b - a
            if partial and rank != 0:
                continue  # the replicated tail chunk is written once
            out_hwc = np.moveaxis(seg, 1, -1)
            if split is not SplitMode.NONE:
                orig_hwc = np.moveaxis(orig_seg, 1, -1)
                out_hwc = np.stack([
                    compose(orig_hwc[i], out_hwc[i], split, labels)
                    for i in range(out_hwc.shape[0])
                ])
            ppath = f"{base}.c{_ci:04d}s{sh:03d}{ext}"
            wtr = VideoWriterStream(ppath, out_fps)
            wtr.write_chunk(out_hwc)
            part_paths.append((_ci, sh, wtr.close()))
        _acc("encode_s", _time.monotonic() - t0)

    def maybe_checkpoint(item, drain=None):
        _ci, _cpos, clen, _rows, _partial = item
        if (checkpoint_path and checkpoint_every and rank == 0
                and (exp.cursor % checkpoint_every) < clen):
            if drain is not None:
                drain()  # parts of every checkpointed chunk must be on disk
            exp.save_checkpoint(checkpoint_path)

    need_orig = split is not SplitMode.NONE

    if not prefetch:
        for item in plan:
            local = decode_chunk(item)
            processed, original = exp.process_chunk(local, item[2],
                                                    timings=timings,
                                                    fetch_original=need_orig)
            encode_chunk(item, processed, original)
            maybe_checkpoint(item)
    else:
        # a decode POOL keeps the next chunks ready while this one runs SPMD
        # (chunk decodes are independent: each opens its own capture at its
        # own offset — the round-5 stage split measured single-threaded cv2
        # decode as the end-to-end ceiling, 72 ms/frame at 1080p vs 12 ms
        # compute); an encode thread drains finished chunks. Chunks still hit
        # the device strictly in order — futures are consumed in plan order.
        from concurrent.futures import ThreadPoolExecutor

        to_encode: _queue.Queue = _queue.Queue(maxsize=2)
        encode_err: List[BaseException] = []

        def encode_worker():
            while True:
                got = to_encode.get()
                try:
                    if got is None:
                        return
                    if not encode_err:  # fail-fast: stop writing after error
                        encode_chunk(*got)
                except BaseException as e:
                    encode_err.append(e)
                finally:
                    to_encode.task_done()

        def drain_encode():
            to_encode.join()
            if encode_err:
                raise encode_err[0]

        enc_t = threading.Thread(target=encode_worker, daemon=True)
        enc_t.start()
        pool = ThreadPoolExecutor(max_workers=max(1, decode_workers),
                                  thread_name_prefix="lvmt-decode")
        try:
            from collections import deque

            inflight: deque = deque()
            pending = iter(plan)

            def top_up():
                # bound decoded-chunks-in-RAM: workers + 1 chunks in flight
                while len(inflight) < max(2, decode_workers + 1):
                    item = next(pending, None)
                    if item is None:
                        return
                    inflight.append((item, pool.submit(decode_chunk, item)))

            top_up()
            while inflight:
                item, fut = inflight.popleft()
                local = fut.result()  # decode errors surface here, in order
                top_up()
                processed, original = exp.process_chunk(local, item[2],
                                                        timings=timings,
                                                        fetch_original=need_orig)
                to_encode.put((item, processed, original))
                maybe_checkpoint(item, drain=drain_encode)
            drain_encode()
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
            to_encode.put(None)  # stop the encoder
            enc_t.join(timeout=60)

    if checkpoint_path and checkpoint_every and rank == 0 and plan:
        # final save: a completed run's checkpoint must read cursor == end
        # so a re-run short-circuits to the finished output below — the
        # periodic save above misses the last partial chunk whenever
        # cursor % checkpoint_every lands inside it (found driving the CLI,
        # round 5)
        exp.save_checkpoint(checkpoint_path)

    if jax.process_count() > 1:
        # all hosts must finish encoding before the coordinator concats:
        # a REAL cross-process rendezvous (a local jit add synchronizes
        # nothing — code-review round 4)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("lvmt_distributed_export_encode")
    if stats is not None:
        stats["frames"] = exp.cursor
        stats.update(timings)
        stats["wall_s"] = _time.monotonic() - t_wall0
    if rank != 0:
        return part_paths[-1][2] if part_paths else output_path

    # coordinator: concat exactly THIS RUN's expected parts, in (chunk,
    # shard) order — never a glob, so stale parts from an older crashed run
    # on the same output path can't be merged in (the cli resume concat has
    # the same manifest rule). In a multi-host run the parts live on shared
    # storage under the same deterministic names.
    if resume_at >= end and os.path.exists(output_path):
        # the checkpoint says every chunk finished: the prior run already
        # concatenated (and by default deleted) the parts — demand nothing,
        # return the finished file (advisor round 4)
        return output_path
    missing = [p for _c, _s, p in expected if not os.path.exists(p)]
    if missing:
        raise IOError(
            f"distributed export: {len(missing)} expected part file(s) "
            f"missing (first: {missing[0]}) — on multi-host, parts must land "
            "on storage shared with the coordinator")
    t_cc = _time.monotonic()
    final = concat_videos([p for _c, _s, p in expected], output_path, out_fps)
    if not keep_parts:
        for _c, _s, p in expected:
            if os.path.abspath(p) != os.path.abspath(final):
                os.unlink(p)
    if stats is not None:
        stats["concat_s"] = _time.monotonic() - t_cc
        stats["wall_s"] = _time.monotonic() - t_wall0
    return final
