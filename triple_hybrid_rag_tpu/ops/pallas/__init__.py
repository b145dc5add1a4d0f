"""Pallas TPU kernels for the hot ops.

Each kernel has a shape-identical XLA reference implementation in ``ops/`` used for
verification (and as the CPU path — kernels run in interpret mode off-TPU). Kernels:

- ``maxsim_kernel``: blockwise late-interaction MaxSim — document-token tiles stream
  through VMEM with a running per-query-token max (SURVEY.md §5.7's blockwise
  decomposition requirement), so arbitrarily long documents never materialize a full
  similarity matrix.
- ``lexical_kernel``: doc-major BM25 membership scan — fuses the term-id compare, the
  any-over-query reduce, and the weighted sum into one streaming pass (XLA's broadcast
  formulation is compute-bound on the (N, L, Q) compare; the kernel keeps the whole
  block in VMEM and loops query slots in registers).
- ``dense_kernel``: tiled (B, D) x (D, N) bf16 scoring matmul with f32 accumulation.
- ``fused_topk``: fused dense scoring + exact top-k — matmul with an in-VMEM
  bucket-max reduction so the f32[B, N] score matrix never reaches HBM
  (SURVEY.md §7 hard part (b)); exact ids incl. ties via a tiny rescore stage.
"""

from .dense_kernel import dense_scores_pallas
from .fused_topk import bucket_maxima_pallas, fused_dense_topk
from .lexical_kernel import score_termtable_pallas
from .maxsim_kernel import maxsim_scores_pallas

__all__ = [
    "dense_scores_pallas",
    "score_termtable_pallas",
    "maxsim_scores_pallas",
    "fused_dense_topk",
    "bucket_maxima_pallas",
]
