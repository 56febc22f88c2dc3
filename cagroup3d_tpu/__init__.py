"""CAGroup3D-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the CAGroup3D
indoor 3D detection framework (reference: Haiyang-W/CAGroup3D, OpenPCDet).
"""

__version__ = "0.1.0"
