"""live-video-magnification_tpu — a TPU-native Eulerian video magnification framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tschnz/Live-Video-Magnification (the "LiViM" desktop app): the three magnification
pipelines (Laplacian motion, Gaussian+FFT color, Riesz phase), the streaming engine
around them, and batch export — built batched, functional, and sharded for TPU
instead of per-frame cv::Mat processing on CPU threads.

Layering (lower layers never import higher ones):

    ops/        pure-jnp + Pallas numeric kernels (pyramids, temporal filters,
                Riesz transform, color conversion, resize)
    models/     the three magnification pipelines as pure, scannable step
                functions with explicit carried state
    parallel/   jax.sharding Mesh construction, frame-tile sharding with halo
                exchange, sharded reductions
    engine/     host-side streaming runtime: sources, bounded queues, latest-wins
                mailbox, RCU config, instrumentation, playback controller
    export/     offline batch export (split composition, codecs, checkpoints)
    io/         video decode/encode
    utils/      small shared helpers
"""

__version__ = "0.1.0"
