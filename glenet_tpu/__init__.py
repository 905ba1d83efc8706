"""glenet_tpu — TPU-native LiDAR 3D detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of GLENet
(Eaphan/GLENet: OpenPCDet-0.5.2 fork + CVAE label-uncertainty estimation),
designed TPU-first: static padded shapes, fused on-device voxelization,
pjit data parallelism over a device mesh, and Pallas kernels for sparse ops.
"""
__version__ = '0.1.0'
