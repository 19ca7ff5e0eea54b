"""TPU-native SLFP/SFP quantization framework for CNNs.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo ``happyxtt/CNNs_SLFP_quantization`` (PyTorch, single GPU):

- SFP<3,3> (7-bit), SLFP<3,4> (8-bit) and SFP<4,4> fake quantization with
  straight-through-estimator gradients (reference: utils/sfp_quant.py).
- Quantized conv / dense layers with per-tensor max scaling
  (reference: utils/conv2d_func.py).
- Quantization-aware optimizers DSGD / SSGD (reference: utils/optimizer.py).
- A 6-net model zoo (MobileNetV1, ShuffleNetV2, VGG16, ResNet50, AlexNet,
  SqueezeNet1.0 (+ activation variants)) for CIFAR-100 and ImageNet-1k.
- Max-abs calibration, training / eval drivers, metrics and checkpoints.

The compute path is idiomatic TPU: NHWC layouts, XLA convolutions, Pallas
fused dequant-matmul kernels for packed 8-bit weights, and `jax.sharding`
mesh parallelism (data-parallel batch + ICI weight sharding) instead of the
reference's single-GPU eager loop.
"""

__version__ = "0.1.0"

from cnns_slfp_quantization_tpu.ops import sfp  # noqa: F401
