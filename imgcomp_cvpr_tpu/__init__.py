"""imgcomp_cvpr_tpu — TPU-native (JAX/XLA/Pallas) learned image compression.

A from-scratch framework with the capabilities of fab-jul/imgcomp-cvpr
("Conditional Probability Models for Deep Image Compression", CVPR 2018):
a convolutional autoencoder with a learned importance map, soft-to-hard
quantization against learned centers, a masked-3D-conv autoregressive
context model, and a real entropy-coding runtime — redesigned for TPU:
NHWC layouts, jit/pjit over device meshes, on-device wavefront decoding,
and a vectorized interleaved-rANS coder.
"""

__version__ = '0.1.0'
