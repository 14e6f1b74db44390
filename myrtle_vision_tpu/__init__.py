"""myrtle_vision_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision framework.

A ground-up rebuild of the capabilities of MyrtleSoftware/myrtle-vision
(reference: /root/reference) designed TPU-first:

- One shared ViT backbone driving classification (RESISC45), semantic
  segmentation (DLRSD) and object detection (DIOR), selected by the
  ``decoder`` field of a JSON config (reference: src/myrtle_vision/models/
  vit.py:196-201).
- A quantization subsystem simulating FPGA number formats (fixed-point and
  reduced floats) with straight-through-estimator fake-quant primitives
  (reference: src/myrtle_vision/utils/quantize.py) implemented as JAX/Pallas
  kernels instead of QPyTorch CUDA extensions.
- DeiT knowledge distillation (reference: src/myrtle_vision/models/distill.py).
- SPMD data/tensor parallel training over a ``jax.sharding.Mesh`` with XLA
  collectives instead of NCCL DDP.

The public JSON config schema of the reference is preserved verbatim so that
existing train_configs/data_configs run unchanged.
"""

__version__ = "0.1.0"
