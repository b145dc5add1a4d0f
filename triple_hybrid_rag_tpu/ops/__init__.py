"""Device-resident compute ops: BM25 scoring, dense top-k, graph expansion, RRF fusion,
MaxSim late-interaction reranking. All ops are jit-compatible with static shapes; Pallas
kernels live in ``ops/pallas/`` with XLA reference implementations alongside."""

from .topk import masked_top_k, merge_topk

__all__ = ["masked_top_k", "merge_topk"]
