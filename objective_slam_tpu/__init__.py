"""objective_slam_tpu — TPU-native point-pair-feature (PPF) 6-DoF object recognition.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
CUDA pipeline in ``nicolasavru/objective-slam`` (Drost et al. 2010 "Model
Globally, Match Locally"): given a model point cloud and a scene point cloud
(both with normals), recover the rigid transform placing the model in the
scene via discretized point-pair features and Hough-style voting.

Architecture (TPU-first, not a port):
  * ``ops.transforms``  — batched rigid-transform / quaternion math
  * ``ops.ppf``         — PPF features, truncating quantization, packed
                          integer keys (replaces FNV-1a byte hashing of the
                          reference; an FNV mode is kept for parity checks)
  * ``ops.hashing``     — FNV-1a 32-bit in uint32 lanes (bit-parity mode)
  * ``ops.voting``      — expansion-based vote generation + dense Hough
                          accumulator (the reference's sort/histogram path
                          re-thought as static-shape segment math)
  * ``ops.clustering``  — pose clustering, dense pairwise formulation on MXU
  * ``models.drost``    — the flagship model: ModelDescription + match()
  * ``parallel``        — shard_map sharding of scene reference points
  * ``utils``           — PLY I/O, voxel grid, normals, synthetic scenes,
                          validation metrics
  * ``pipeline``        — multi-(scene,model) registration driver
  * ``cli``             — `alignment`-equivalent command line

Reference layer map: see SURVEY.md §1; component inventory §2.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache. Dataset sweeps and CLI invocations span
# many processes over identical static shapes; without this every process
# re-pays multi-minute compiles of the big voting graphs. Set via
# jax.config (not the env var): this image's sitecustomize imports jax at
# interpreter start, so JAX_COMPILATION_CACHE_DIR set here is never read.
# TPU-platform only: XLA:CPU persists host-feature-specific AOT code whose
# cross-process reload warns about SIGILL risk (and CPU compiles are cheap).
if not _os.environ.get("OBJECTIVE_SLAM_TPU_NO_XLA_CACHE"):
    import jax as _jax

    _plat = (_jax.config.jax_platforms
             or _os.environ.get("JAX_PLATFORMS", ""))
    if (_jax.config.jax_compilation_cache_dir is None
            and ("axon" in _plat or "tpu" in _plat)):
        _jax.config.update("jax_compilation_cache_dir",
                           "/tmp/objective_slam_tpu_xla_cache")

from objective_slam_tpu.config import PPFConfig  # noqa: F401
from objective_slam_tpu.models.drost import (  # noqa: F401
    MatchCaps,
    ModelDescription,
    build_model_description,
    match,
    match_with_state,
)
