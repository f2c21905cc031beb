"""Message-passing ops: XLA reference path and Pallas TPU kernels.

TPU-native replacement for DGL's native kernel core (SURVEY.md §2.2:
g-SpMM `src/array/cuda/spmm.cu`, g-SDDMM `src/array/cuda/sddmm.cu`,
edge-softmax `python/dgl/ops/edge_softmax.py`, segment-reduce
`src/array/*/segment_reduce.*` — all reconstructed locations, mount empty).

Two interchangeable backends:
  * ``kgat_tpu.ops.ref``    — pure jnp/segment_sum implementations; the
    correctness oracle and the CPU/debug path.
  * ``kgat_tpu.ops.pallas`` — hand-written Pallas kernels for the hot ops,
    each with a custom VJP mirroring DGL's dual-op autograd structure
    (SpMM backward == SDDMM on the reversed graph and vice versa).

``get_backend(name)`` returns a namespace with a uniform surface:
  spmm(graph, edge_w, x) / segment_softmax(graph, logits) /
  sddmm_dot(graph, a, b).
"""

from kgat_tpu.ops import ref as _ref


def get_backend(name: str = "ref"):
    if name == "ref":
        return _ref
    if name == "pallas":
        from kgat_tpu.ops import pallas_backend as _pb
        return _pb
    raise ValueError(f"unknown ops backend: {name!r}")
