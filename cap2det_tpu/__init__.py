"""cap2det_tpu: a TPU-native (JAX/XLA/Pallas) weakly-supervised object
detection framework with the capabilities of Cap2Det (ICCV'19).

The framework trains a Fast-RCNN-style detector from image-level labels
extracted from free-text captions. Reference behavior is documented per
module with `file:line` citations into the upstream TF-1.x implementation
(mounted at /root/reference), but the design here is TPU-first: static
shapes, masked reductions over the padded proposal axis, fused Pallas
kernels for the hot ops, and SPMD data parallelism over a jax.sharding
Mesh.
"""

__version__ = "0.1.0"
