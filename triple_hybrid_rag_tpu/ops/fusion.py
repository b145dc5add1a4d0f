"""Weighted Reciprocal Rank Fusion + safety gating + denoising as fused device ops.

Reimplements, with static shapes and no host round-trips, the reference's fusion stack:

- weighted RRF ``score = w / (k + rank)`` with rank 1-indexed, summed across channels per
  chunk, k = 60 (``/root/reference/src/voice_agent/rag2/retrieval.py:358-376`` and
  ``triple-hybrid-rag/src/triple_hybrid_rag/core/fusion.py:167-186``);
- source-channel tracking (fusion.py:98-145 ``sources`` set -> a bitmask here);
- post-rerank safety gate: refuse when max score < threshold, then keep only
  score >= alpha * max, take top-k (``rag2/retrieval.py:461-495``);
- the standalone lib's *conformal* denoising variant: keep score >= percentile(scores,
  (1 - alpha) * 100), skipped for fewer than 3 results (``core/fusion.py:218-247``);
- min-max score normalization (``core/fusion.py:291-318``).

Everything here operates on fixed-width (ids, scores) pairs where id -1 marks an invalid
slot — the static-shape encoding of the reference's variable-length candidate lists
(SURVEY.md §7 hard parts (e), (f)). Candidate-set union and deduplication are O(K^2)
comparisons over K <= ~200 candidates: trivially small VPU work that replaces the
reference's Python dict merge.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .topk import NEG_INF

# source-channel bitmask values (SearchChannel tracking)
LEXICAL_BIT = 1
SEMANTIC_BIT = 2
GRAPH_BIT = 4


class FusedCandidates(NamedTuple):
    """Fixed-width fused candidate set, sorted by RRF score descending."""

    ids: jax.Array  # i32[K] corpus rows, -1 invalid
    rrf: jax.Array  # f32[K] fused ordering score (rank-RRF; score-blended when score_blend > 0)
    lexical: jax.Array  # f32[K] raw per-channel scores (0 when absent)
    semantic: jax.Array  # f32[K]
    graph: jax.Array  # f32[K]
    channels: jax.Array  # i32[K] source-channel bitmask


def _rank_lookup(
    cand_ids: jax.Array, ch_ids: jax.Array, ch_scores: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """For each candidate, find (found, rank, raw_score) in one channel's ranked list."""
    eq = (cand_ids[:, None] == ch_ids[None, :]) & (ch_ids[None, :] >= 0)
    found = eq.any(axis=1)
    rank = jnp.argmax(eq, axis=1)  # 0-based position; valid only where found
    raw = jnp.where(found, ch_scores[rank], 0.0)
    return found, rank, raw


@functools.partial(
    jax.jit, static_argnames=("rrf_k", "top_k", "score_blend", "lex_conf_gate")
)
def fuse_rrf(
    lex_ids: jax.Array,
    lex_scores: jax.Array,
    sem_ids: jax.Array,
    sem_scores: jax.Array,
    graph_ids: jax.Array,
    graph_scores: jax.Array,
    weights: jax.Array,  # f32[3] (lexical, semantic, graph)
    *,
    rrf_k: int = 60,
    top_k: int = 50,
    score_blend: float = 0.0,
    lex_conf_gate: float = 0.0,
) -> FusedCandidates:
    """Fuse three ranked channels with weighted RRF; dedupe; sort; truncate to top_k.

    Channel id lists are assumed rank-ordered (position = rank - 1), the invariant
    guaranteed by :func:`~triple_hybrid_rag_tpu.ops.topk.masked_top_k`.

    ``score_blend`` (config ``fusion_score_blend``) interpolates the ordering key
    between pure rank-RRF (0.0, the reference's only fusion — its fusion.py:52-165)
    and CombSUM over per-channel min-max-normalized scores (1.0): rank fusion
    discards score magnitude, so a weak channel's confident-looking rank-1 hit gets
    full voice even when its score barely clears its list's floor. Measured on the
    1500-doc docstring corpus (scripts/fusion_lab.py, eval_results/fusion_lab.json):
    rank-RRF recall@10 0.525 -> CombSUM 0.560 with identical channel inputs. Both
    terms are max-normalized over the candidate pool before blending so the knob
    interpolates between comparable [0, 1] scales.

    ``lex_conf_gate`` (config ``fusion_lex_conf_gate``) scales the SEMANTIC
    channel's weight per query by how confident the lexical channel is:
    ``g = 1 - min(1, gate * margin)`` with ``margin`` the relative BM25 gap
    between lexical's top-2 raw scores. A decisive lexical ranking (large
    margin) silences the dense channel; a flat or empty lexical ranking
    (paraphrase queries — zero term overlap) leaves dense at full voice. This is
    the score-statistics analogue of the reference planner's per-intent channel
    weights (its query_planner.py emits static weights; the gate adapts them to
    the observed evidence). 0.0 disables (default off in the reference-parity
    sense; see config for the measured default).
    """
    cand_ids = jnp.concatenate([lex_ids, sem_ids, graph_ids]).astype(jnp.int32)
    kt = cand_ids.shape[0]

    if lex_conf_gate > 0.0:
        lv = (lex_ids >= 0).astype(jnp.float32)
        n_lex = jnp.sum(lv)
        s0 = lex_scores[0]
        # STATIC width check as a python conditional: a runtime jnp.where would
        # evaluate lex_scores[1] on the width-1 disabled-channel placeholder,
        # silently relying on gather clamping for an out-of-bounds index
        s1 = lex_scores[1] if lex_scores.shape[0] > 1 else jnp.float32(0.0)
        margin = jnp.where(
            n_lex >= 2.0, (s0 - s1) / jnp.maximum(s0, 1e-9), 0.0
        )
        g = 1.0 - jnp.minimum(1.0, lex_conf_gate * jnp.maximum(margin, 0.0))
        weights = weights * jnp.stack([1.0, g, 1.0]).astype(weights.dtype)

    rrf = jnp.zeros((kt,), jnp.float32)
    ssum = jnp.zeros((kt,), jnp.float32)
    raw_scores = []
    chan_bits = jnp.zeros((kt,), jnp.int32)
    for bit, (ch_ids, ch_scores, w) in zip(
        (LEXICAL_BIT, SEMANTIC_BIT, GRAPH_BIT),
        (
            (lex_ids, lex_scores, weights[0]),
            (sem_ids, sem_scores, weights[1]),
            (graph_ids, graph_scores, weights[2]),
        ),
    ):
        found, rank, raw = _rank_lookup(cand_ids, ch_ids, ch_scores)
        # reference formula: w / (k + rank) with rank starting at 1
        rrf = rrf + jnp.where(found, w / (rrf_k + rank.astype(jnp.float32) + 1.0), 0.0)
        if score_blend > 0.0:
            norm = minmax_normalize(ch_ids, ch_scores)
            ssum = ssum + jnp.where(found, w * norm[rank], 0.0)
        raw_scores.append(raw)
        chan_bits = chan_bits | jnp.where(found, bit, 0)

    # dedupe: mask every occurrence after the first (strict-lower-triangular equality)
    eq = cand_ids[:, None] == cand_ids[None, :]
    tri = jnp.tril(jnp.ones((kt, kt), jnp.bool_), k=-1)
    is_dup = (eq & tri).any(axis=1)
    valid = (cand_ids >= 0) & ~is_dup

    if score_blend > 0.0:
        s = float(score_blend)
        r_max = jnp.max(jnp.where(valid, rrf, 0.0))
        s_max = jnp.max(jnp.where(valid, ssum, 0.0))
        rrf = (1.0 - s) * rrf / jnp.maximum(r_max, 1e-12) + (
            s * ssum / jnp.maximum(s_max, 1e-12)
        )

    sort_key = jnp.where(valid, rrf, NEG_INF)
    # the candidate pool can be smaller than top_k (single channel, tiny k, or a
    # rare-token query) — select what exists and pad the tail with invalid slots
    k_sel = min(top_k, kt)
    order = jax.lax.top_k(sort_key, k_sel)[1]
    ok = valid[order]
    if k_sel < top_k:
        order = jnp.pad(order, (0, top_k - k_sel))
        ok = jnp.pad(ok, (0, top_k - k_sel))  # padded slots -> fill values

    def take(x: jax.Array, fill: jax.Array) -> jax.Array:
        return jnp.where(ok, x[order], fill)

    return FusedCandidates(
        ids=take(cand_ids, jnp.int32(-1)),
        rrf=take(rrf, jnp.float32(0.0)),
        lexical=take(raw_scores[0], jnp.float32(0.0)),
        semantic=take(raw_scores[1], jnp.float32(0.0)),
        graph=take(raw_scores[2], jnp.float32(0.0)),
        channels=take(chan_bits, jnp.int32(0)),
    )


class SafetyResult(NamedTuple):
    ids: jax.Array  # i32[top_k]
    scores: jax.Array  # f32[top_k]
    refused: jax.Array  # bool[] — no result clears the safety threshold
    max_score: jax.Array  # f32[]


@functools.partial(jax.jit, static_argnames=("top_k",))
def apply_safety_denoise(
    ids: jax.Array,
    scores: jax.Array,
    threshold: jax.Array,  # f32[] safety threshold (refuse below)
    alpha: jax.Array,  # f32[] denoise: keep score >= alpha * max
    *,
    top_k: int,
    gate_scores: Optional[jax.Array] = None,
) -> SafetyResult:
    """Production safety + alpha-max denoising (reference rag2/retrieval.py:461-495).

    Refusal is returned as a flag rather than an empty list; the host decides how to
    surface it (the reference returns refused=True with a reason string).

    ``gate_scores`` (default = ``scores``) drives refusal, the reported
    max_score, and the alpha-max keep mask, while ``scores`` drives the final
    ordering. The split exists for ``rerank_blend_rrf``: the blended ordering
    score contains a min-max-normalized RRF term whose top candidate is always
    1.0, so gating on it would never refuse — the gate must see the pure
    calibrated rerank score, which carries absolute relevance meaning."""
    gate = scores if gate_scores is None else gate_scores
    valid = ids >= 0
    max_score = jnp.max(jnp.where(valid, gate, NEG_INF))
    has_any = valid.any()
    max_score = jnp.where(has_any, max_score, 0.0)
    refused = jnp.logical_or(~has_any, max_score < threshold)

    # alpha*max exceeds max when max is NEGATIVE (out-of-domain queries with
    # all-negative calibrated scores dropped EVERYTHING without refusing);
    # min(alpha*max, max) keeps the alpha rule for positive maxima and always
    # preserves the argmax — the denoise invariant
    cutoff = jnp.minimum(alpha * max_score, max_score)
    keep = valid & (gate >= cutoff) & ~refused
    key = jnp.where(keep, scores, NEG_INF)
    vals, order = jax.lax.top_k(key, top_k)
    ok = vals > NEG_INF
    return SafetyResult(
        ids=jnp.where(ok, ids[order], -1).astype(jnp.int32),
        scores=jnp.where(ok, vals, 0.0),
        refused=refused,
        max_score=max_score,
    )


@jax.jit
def conformal_denoise_mask(ids: jax.Array, scores: jax.Array, alpha: jax.Array) -> jax.Array:
    """Conformal denoising keep-mask (standalone-lib variant, core/fusion.py:218-247):
    keep results with score >= percentile(scores, (1 - alpha) * 100), linear
    interpolation over the *valid* scores only; identity when fewer than 3 valid."""
    valid = ids >= 0
    n = jnp.sum(valid)

    # ascending sort with invalids pushed to +inf (so the first n entries are the valid ones)
    sortable = jnp.where(valid, scores, jnp.inf)
    ordered = jnp.sort(sortable)

    q = (1.0 - alpha) * 100.0
    pos = q / 100.0 * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    lo_v = ordered[jnp.clip(lo, 0, ids.shape[0] - 1)]
    hi_v = ordered[jnp.clip(hi, 0, ids.shape[0] - 1)]
    thresh = lo_v + (hi_v - lo_v) * (pos - lo.astype(jnp.float32))

    keep = valid & (scores >= thresh)
    return jnp.where(n < 3, valid, keep)


@jax.jit
def minmax_normalize(ids: jax.Array, scores: jax.Array) -> jax.Array:
    """Min-max normalize valid scores to [0, 1]; all-equal maps to 1.0
    (reference core/fusion.py:291-318)."""
    valid = ids >= 0
    lo = jnp.min(jnp.where(valid, scores, jnp.inf))
    hi = jnp.max(jnp.where(valid, scores, -jnp.inf))
    span = hi - lo
    normalized = jnp.where(span > 0, (scores - lo) / jnp.where(span > 0, span, 1.0), 1.0)
    return jnp.where(valid, normalized, 0.0)
