"""playground3d_tpu — a TPU-native (JAX/XLA/Pallas) framework for monocular 3D
vehicle detection and multi-camera 3D tracking.

This is a ground-up re-design of the capabilities of the reference research
stack ``DerekGloudemans/3D-playground`` (monocular 3D vehicle detection +
multi-camera roadway-plane tracking on the I-24 testbed), built TPU-first:

* every numeric path is a jitted, fixed-shape, batched JAX function;
* variable-cardinality structures (detections, tracks) are fixed-capacity
  masked arrays;
* the detector (directional RetinaNet) runs in bfloat16 on the MXU with a
  fused anchor decode and masked NMS;
* the batched Kalman filter, association, and geometry all run on-device in
  the same jitted step (no host ping-pong);
* multi-camera / multi-chip scaling uses ``jax.sharding.Mesh`` + ``pjit``.

Subpackages
-----------
geometry    image <-> roadway-plane ("space") <-> tracker-state transforms
ops         NMS, crop-and-resize, IoU, linear assignment (XLA + Pallas)
models      ResNet + FPN + directional heads, anchors, box decode
losses      focal + corner smooth-L1 + vanishing-point losses (vectorized)
track       fixed-slot batched Kalman filter + track lifecycle
data        host-side frame pipeline, synthetic video, timestamp codec
pipeline    single-camera and multi-camera crop trackers, detect-only app
evaluation  46-column CSV schema, MOT evaluator, track resampling
train       pjit data-parallel training, KF-parameter fitting
parallel    device mesh and sharding helpers
utils       constants (class tables), config, profiling, checkpoints
"""

__version__ = "0.1.0"
