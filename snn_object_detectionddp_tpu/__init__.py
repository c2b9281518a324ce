"""TPU-native spiking/temporal object-detection framework for DSEC.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
project ``Anannayjain/SNN_Object_DetectionDDP`` (a PyTorch temporal object
detector on the DSEC driving dataset). The temporal recurrence is realized
as convolutional spiking (LIF) layers run as a ``lax.scan`` over timesteps
with surrogate-gradient BPTT, and training is data-parallel over a JAX
device mesh with gradients all-reduced over ICI.

Subpackages
-----------
- ``config``    config.yaml schema (reference-compatible) + validation
- ``data``      DSEC indexing, label alignment, fixed-shape input pipeline
- ``models``    LIF cells, ConvLSTM, spiking backbone, temporal U-Net, Detect head
- ``ops``       box math, anchors, fixed-shape NMS
- ``losses``    TAL assigner + CIoU + DFL + BCE detection loss
- ``train``     jitted train/eval steps, OneCycle schedule, checkpointing, loops
- ``parallel``  device mesh + data-parallel sharding
- ``evals``     mAP, validator, FPS/FLOPs benchmark, optical-flow tracker
- ``viz``       detection overlays + video stitching
- ``kernels``   Pallas TPU kernels (fused LIF temporal scan)
"""

__version__ = "0.1.0"
