"""airv2x_tpu — a TPU-native (JAX/XLA/Pallas/pjit) cooperative V2X perception framework.

Re-designed from scratch with the capabilities of taco-group/AirV2X-Perception
(an OpenCOOD-derived PyTorch framework): multi-agent (vehicle / road-side-unit /
drone) LiDAR+camera BEV perception with intermediate feature fusion, multiclass
3D detection, BEV segmentation and tracking.

Design stance (TPU-first, not a port):
  * every ragged quantity (points, voxels, agents, boxes, NMS survivors) is a
    fixed-capacity padded array with a mask, so the full pipeline including
    voxelization, fusion, decoding and rotated NMS is jit-compiled end-to-end;
  * the agent axis is a dense, statically-laid-out axis (vehicle slots, then
    RSU slots, then drone slots) instead of the reference's ragged
    ``record_len`` + ``tensor_split`` plumbing;
  * data parallelism is expressed with ``jax.sharding`` over a device mesh
    (ICI/DCN collectives inserted by XLA) instead of DDP/NCCL;
  * hot ops (pillarization, BEV scatter, rotated IoU / NMS) are implemented as
    vectorized XLA programs with Pallas kernels where XLA's default lowering
    leaves performance on the table.
"""

from airv2x_tpu.version import __version__

__all__ = ["__version__"]
