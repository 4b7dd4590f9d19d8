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

from objective_slam_tpu.config import PPFConfig  # noqa: F401
from objective_slam_tpu.models.drost import (  # noqa: F401
    ModelDescription,
    build_model_description,
    match,
)
