"""openess-tpu: TPU-native open-vocabulary event-based semantic segmentation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of OpenESS (CVPR'24,
reference: ldkong1205/OpenESS). The compute path is jit/pjit-compiled (bf16 on
MXU, NHWC layouts, `lax.scan` recurrences); event-stream decoding and
voxelization run as fused device ops; training is data/tensor-parallel over a
`jax.sharding.Mesh`.

Subpackages
-----------
- ``ops``       device kernels: voxelization, segment pooling, confusion matrix
- ``models``    flax models: DeepLabV3-ResNet50, E2VID ConvLSTM-UNet,
                SemSegE2VID decoder, MaskCLIP ViT, frame teacher
- ``data``      host-side event readers (DSEC h5 / DDD17 memmap) + pipelines
- ``losses``    Dice+CE task loss, superpixel InfoNCE, sym-JS, cosine distill
- ``training``  functional train steps, trainer loop, orbax checkpointing
- ``parallel``  mesh construction and sharding rules
- ``config``    YAML settings (schema-compatible with the reference configs)
"""

__version__ = "0.1.0"
