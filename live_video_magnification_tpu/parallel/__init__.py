"""Multi-chip scaling: mesh construction + frame-tile/batch sharding.

The reference is a single-process desktop app; its "parallelism" is a 3-stage
thread pipeline (SURVEY.md §2.9). The TPU-native equivalents here:

  * data parallelism  — a 'batch' mesh axis over independent streams/clips,
  * frame-tile (spatial) parallelism — a 'tile' mesh axis over image rows;
    convolution stencils at tile boundaries become XLA-inserted halo exchanges
    (collective-permutes over ICI), and the color/output min-max rescales become
    all-reduces. We annotate shardings and let the SPMD partitioner place the
    collectives — the scaling-book recipe — rather than hand-writing NCCL-style
    point-to-point like a GPU port would.

Temporal state stays sharded exactly like its frames, so streaming steps do no
resharding between frames.
"""

from live_video_magnification_tpu.parallel.mesh import make_mesh
from live_video_magnification_tpu.parallel.sharding import (
    build_sharded_step,
    shard_batched_state,
)
