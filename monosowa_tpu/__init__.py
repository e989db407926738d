"""monosowa_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the MonoSOWA system.

Two decoupled subsystems, mirroring the reference's architecture
(see /root/reference README + SURVEY.md):

* ``monosowa_tpu.sowa``  — the pseudo-label auto-labelling pipeline: monocular
  depth -> pseudo-LiDAR, instance masks, ego-motion aggregation, the Local
  Object Motion Model (3D tracking + moving/standing), and grid-search 3D
  template fitting with the Template Fitting Loss — all batched/vmapped XLA.
* ``monosowa_tpu.models`` / ``monosowa_tpu.train`` — a depth-aware DETR
  monocular 3D detector (MonoDETR-equivalent) in Flax with the Canonical
  Object Space module, trained with pjit data parallelism.

Shared infrastructure: ``kittiio`` (byte-compatible KITTI label/calib IO),
``ops`` (Pallas + XLA kernels: deformable attention, template-fitting loss,
rotated 3D box IoU, kNN, Hungarian matching), ``evalkitti`` (KITTI AP stack),
``parallel`` (device-mesh / sharding helpers).
"""

__version__ = "0.1.0"
