"""amq_tpu — TPU-native mixed-precision weight-only quantization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of dlwns147/amq
(AMQ, EMNLP 2025): HQQ/AWQ/GPTQ/OWQ per-group INT2/3/4 quantization,
layer-wise sensitivity analysis, NSGA-II mixed-precision bit-allocation
search with MLP/RBF surrogates, and a mixed-bit serving path built on fused
dequantize-matmul Pallas kernels over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
