"""rescan_tpu — a TPU-native (JAX/XLA/Pallas) framework for inductive instance
segmentation of repeated indoor RGBD scans, with the capabilities of the
Rescan pipeline (Halber et al., ICCV 2019).

Architecture (TPU-first, not a port):

- ``rescan_tpu.io``      — byte-compatible host codecs for the ``.ply``, ``.rsdb``,
  pose-proposal ``.bin`` and eval ``.txt`` formats, implemented in numpy.
- ``rescan_tpu.core``    — the tensor point-cloud data model: a 5-level LoD
  pyramid of fixed-shape device arrays, plus the temporal object database.
- ``rescan_tpu.ops``     — the compute kernels: grid-bucketed fixed-K neighbor
  search, batched point-to-plane ICP, batched pose-hypothesis scoring,
  voxel rasterization / occupancy, RANSAC planes, arrangement energy,
  label transfer + smoothing. All are jit-able, fixed-shape, batched.
- ``rescan_tpu.pipeline``— the four stage entry points (seg2rsdb,
  pose_proposal, segment_transfer, create_eval_files) with CLI surfaces
  mirroring the reference binaries.
- ``rescan_tpu.parallel``— device-mesh / shard_map utilities for scaling the
  hypothesis and point axes across TPU chips.
- ``rescan_tpu.eval``    — evaluation metrics (semantic label IoU, semantic
  instance AP, instance-transfer IoU).
"""

__version__ = "0.1.0"

# Honor an explicit JAX_PLATFORMS before any backend init: this image's
# sitecustomize force-registers the axon TPU PJRT plugin, which ignores the
# env var — so without this pin a JAX_PLATFORMS=cpu run still waits on the
# TPU tunnel (indefinitely, during an outage). jax.config is the effective
# switch (same pin as tests/conftest.py and bench.py).
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        pass  # backend already initialized; the caller's choice stands
