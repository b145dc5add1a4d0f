"""Device-resident index structures derived from the :class:`~triple_hybrid_rag_tpu.corpus.CorpusStore`.

Each index is a pytree of arrays living in HBM (optionally sharded over a mesh) plus the
static metadata needed to specialize its compiled query ops."""

from .bm25_index import BM25Index, build_bm25_index
from .dense_index import DenseIndex, build_dense_index
from .graph_index import GraphIndex, build_graph_index

__all__ = [
    "BM25Index",
    "build_bm25_index",
    "DenseIndex",
    "build_dense_index",
    "GraphIndex",
    "build_graph_index",
]
