"""Hand-written Pallas TPU kernels for the hot message-passing ops.

TPU-native equivalents of DGL's native CUDA/C++ kernel core
(SURVEY.md §2.2): segment-sum SpMM, relation-blocked SDDMM, fused
segment-softmax. Pallas/Mosaic is the custom-kernel path on TPU — these
kernels are jit-inlined into the XLA program, so there is no FFI layer at
all (the idiomatic-TPU win over DGL's ctypes/DLPack bridge).
"""

from kgat_tpu.ops.pallas.segment_sum import segment_sum_aligned  # noqa: F401
