"""diffcloth_tpu — TPU-native differentiable cloth simulation + trajectory
optimization (JAX/XLA/Pallas), feature-parity rebuild of omegaiota/DiffCloth.
"""
__version__ = "0.1.0"
