"""MaxSim late-interaction reranker (the primary rerank backend).

See ``ops/maxsim.py`` for the scoring math and ``index/maxsim_index.py`` for the storage.
The reranker expects ``query_ctx["q_tokens"]`` / ``query_ctx["q_mask"]`` prepared by the
retriever's query stage (same token embedder as the index build).
"""

from __future__ import annotations

from typing import Optional

import jax

from ..config import RAGConfig, get_settings
from ..index.maxsim_index import MaxSimIndex
from ..ops.fusion import minmax_normalize


class MaxSimReranker:
    def __init__(
        self,
        index: MaxSimIndex,
        config: Optional[RAGConfig] = None,
        calibration: float = 1.0,
    ) -> None:
        self.index = index
        self.config = config or get_settings()
        # embedder-declared score renormalization (ops.maxsim.calibrate_maxsim):
        # anchored encoders compress raw MaxSim, this restores 0.6-gate semantics
        self.calibration = calibration

    def score(self, query_ctx: dict, ids: jax.Array, fused_scores: jax.Array) -> jax.Array:
        from ..ops.maxsim import calibrate_maxsim

        q_tokens = query_ctx.get("q_tokens")
        q_mask = query_ctx.get("q_mask")
        if q_tokens is None or q_mask is None:
            # degradation rung: no token-level query context -> normalized fused order
            return minmax_normalize(ids, fused_scores)
        use_pallas = self.config.use_pallas and jax.devices()[0].platform != "cpu"
        return calibrate_maxsim(
            self.index.score_candidates(ids, q_tokens, q_mask, use_pallas=use_pallas),
            self.calibration,
        )
