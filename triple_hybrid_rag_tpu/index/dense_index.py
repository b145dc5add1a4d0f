"""Dense semantic index: HBM-resident embedding matrix with exact matmul top-k.

Replaces pgvector's HNSW graph traversal (``rag2_semantic_search`` cosine ``<=>`` RPC,
``/root/reference/database/migrations/20260114_rag2_schema.sql:377-410``; HNSW params
``:176-179``). On TPU exact search *is* the right algorithm at this scale (SURVEY.md §7): a
(N, D) bf16 matrix at N=1M, D=1024 is 2 GB of HBM and one query is a single
bandwidth-bound matvec on the MXU — no approximate graph walk, no recall loss.

Matryoshka semantics are preserved exactly as the reference embedder does it: prefix-truncate
the full-dim embedding to ``embedding_dim`` then re-L2-normalize
(``/root/reference/src/voice_agent/rag2/embedder.py:40-68``: truncate_matryoshka + normalize_l2).
Scores are cosine similarity == dot product of unit vectors, matching ``1 - (a <=> b)``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RAGConfig
from ..ops.topk import masked_top_k


def truncate_matryoshka(vectors: np.ndarray, dim: int) -> np.ndarray:
    """Prefix-truncate + re-L2-normalize (reference embedder.py:40-68 semantics)."""
    v = np.asarray(vectors, dtype=np.float32)[..., :dim]
    norms = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.maximum(norms, 1e-12)


@dataclass
class DenseIndex:
    """HBM-resident embedding matrix + static metadata.

    Storage dtypes: f32 / bf16 (2 GB per 1M x 1024 rows) / **int8** with per-row scales
    (1 GB per 1M x 1024 — 4M+ chunks on one v5e chip). The int8 path follows the Pallas
    guide's quantization pattern: symmetric per-row absmax scaling, int8 x int8 -> int32
    on the MXU, rescale to cosine in f32 (~0.3% score error, negligible rank impact —
    tested). The reference's pgvector analogue is the halfvec migration
    (20260113_halfvec_4000.sql)."""

    embeddings: jax.Array  # f32|bf16|int8[n_pad, D] row-unit-normalized (pre-quant)
    valid: jax.Array  # bool[n_pad] occupancy mask (capacity padding)
    n_docs: int
    n_pad: int
    dim: int
    config: RAGConfig
    scales: Optional[jax.Array] = None  # f32[n_pad] per-row dequant scale (int8 only)

    @property
    def is_int4(self) -> bool:
        """Packed-nibble storage (uint8[n_pad, D/2] + per-row scales)."""
        return self.embeddings.dtype == jnp.uint8

    def score(self, query_vec: jax.Array) -> jax.Array:
        """Cosine scores f32[n_pad] for a unit query vector (single MXU matvec)."""
        if self.is_int4:
            return dense_scores_int4_batch(
                self.embeddings, self.scales, query_vec[None, :]
            )[0]
        if self.scales is not None:
            return _dense_scores_int8(self.embeddings, self.scales, query_vec)
        return _dense_scores(self.embeddings, query_vec)

    def append(self, vectors: np.ndarray) -> "DenseIndex":
        """Incremental update: write new rows into spare capacity on device.

        The XLA static-shape answer to incremental indexing (SURVEY.md §7 hard part (c)):
        arrays are capacity-padded, so appends that fit are a single on-device
        ``dynamic_update_slice`` + occupancy-mask extension — no host round trip, no
        recompile (shapes unchanged). When capacity is exceeded the index grows to the
        next capacity multiple (one re-pad, then future appends are in-place again).
        Returns a new index (functionally updated arrays; the old one stays valid).
        """
        n_new = int(vectors.shape[0])
        if n_new == 0:
            return self
        new_total = self.n_docs + n_new
        emb = self.embeddings
        valid = self.valid
        n_pad = self.n_pad
        if new_total > n_pad:
            n_pad = self.config.round_capacity(new_total)
            emb = jnp.pad(emb, ((0, n_pad - emb.shape[0]), (0, 0)))
            valid = jnp.pad(valid, (0, n_pad - valid.shape[0]))
        truncated = truncate_matryoshka(vectors, self.dim)
        scales = self.scales
        if scales is not None:
            if self.is_int4:
                new_vals, new_scale = quantize_rows_int4(truncated)
            else:
                new_vals, new_scale = quantize_rows_int8(truncated)
            if n_pad > scales.shape[0]:
                scales = jnp.pad(scales, (0, n_pad - scales.shape[0]), constant_values=1.0)
            rows = jnp.asarray(new_vals)
            scales = jax.lax.dynamic_update_slice(
                scales, jnp.asarray(new_scale), (self.n_docs,)
            )
        else:
            rows = jnp.asarray(truncated, dtype=emb.dtype)
        emb = jax.lax.dynamic_update_slice(emb, rows, (self.n_docs, 0))
        valid = jax.lax.dynamic_update_slice(
            valid, jnp.ones((n_new,), bool), (self.n_docs,)
        )
        return DenseIndex(
            embeddings=emb, valid=valid, n_docs=new_total, n_pad=n_pad,
            dim=self.dim, config=self.config, scales=scales,
        )

    def search(
        self,
        query_vec: np.ndarray | jax.Array,
        top_k: Optional[int] = None,
        row_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Semantic channel: query embedding -> (ids i32[k], scores f32[k]).

        Cosine similarity in [-1, 1]; invalid (padded) rows are zero vectors scoring 0,
        and are additionally masked out via the occupancy mask so a legitimate negative
        -score document can still be returned."""
        k = top_k or self.config.semantic_top_k
        q = jnp.asarray(query_vec)
        scores = self.score(q)
        valid = self.valid if row_mask is None else self.valid & row_mask
        return masked_top_k(scores, k, valid=valid, invalid_score_floor=-2.0)


@jax.jit
def _dense_scores(embeddings: jax.Array, query_vec: jax.Array) -> jax.Array:
    """One matvec over the corpus, f32 accumulation on the MXU."""
    return jnp.dot(
        embeddings, query_vec.astype(embeddings.dtype), preferred_element_type=jnp.float32
    )


def quantize_rows_int8(mat: np.ndarray):
    """Symmetric per-row absmax int8 quantization (Pallas-guide pattern, host build)."""
    absmax = np.abs(mat).max(axis=1)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    values = np.clip(np.rint(mat / scale[:, None]), -127, 127).astype(np.int8)
    return values, scale


def quantize_rows_int4(mat: np.ndarray):
    """Symmetric per-row absmax int4: codes in [-7, 7], column pair (j, j+D/2)
    packed into one byte (j in the low nibble). Halves dense HBM again vs int8
    (0.5 KB per 1024-d row -> ~16M chunks on one 16 GB chip). The pair layout is
    chosen so unpacking splits into two half-width matmuls with NO interleave:
    low nibbles are columns [0, D/2), high nibbles are columns [D/2, D)."""
    d = mat.shape[1]
    assert d % 2 == 0, f"int4 packing needs even dim, got {d}"
    absmax = np.abs(mat).max(axis=1)
    scale = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float32)
    v = np.clip(np.rint(mat / scale[:, None]), -7, 7).astype(np.int8)
    lo = v[:, : d // 2] & 0xF
    hi = v[:, d // 2 :] & 0xF
    packed = (lo | (hi << 4)).astype(np.uint8)
    return packed, scale


def unpack_int4(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(low i8[N, D/2], high i8[N, D/2]) sign-extended halves of packed rows.

    Works under jit and inside Pallas kernels (int32 shifts only). Column j of
    `low` is original column j; column j of `high` is original column j + D/2."""
    p = packed.astype(jnp.int32)
    low = jnp.right_shift(jnp.left_shift(p, 28), 28).astype(jnp.int8)
    high = jnp.right_shift(jnp.left_shift(p, 24), 28).astype(jnp.int8)
    return low, high


def dense_scores_int4_batch(
    packed: jax.Array, scales: jax.Array, query_vecs: jax.Array
) -> jax.Array:
    """Batched int4 scoring f32[B, n_pad] via full unpack -> two int8 matmuls.

    Materializes the unpacked int8 halves, so this is the SMALL-corpus / staged
    debug path; at engine scale ``int4_topk_blocked`` bounds the unpack
    transient to one row block."""
    q = query_vecs.astype(jnp.float32)
    q_absmax = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-12)
    q_scale = q_absmax / 127.0  # [B, 1]
    q_i8 = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)
    low, high = unpack_int4(packed)
    d2 = packed.shape[1]
    acc = jnp.dot(q_i8[:, :d2], low.T, preferred_element_type=jnp.int32)
    acc += jnp.dot(q_i8[:, d2:], high.T, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * scales[None, :] * q_scale


@functools.partial(
    jax.jit, static_argnames=("k", "bucket", "block", "invalid_score_floor")
)
def int4_topk_blocked(
    packed: jax.Array,       # uint8[N, D/2] packed nibble rows
    scales: jax.Array,       # f32[N] per-row dequant scales
    valid: jax.Array,        # bool[N]
    query_vecs: jax.Array,   # f32[B, D]
    k: int,
    collection_of: Optional[jax.Array] = None,  # i32[N]
    coll_cid: Optional[jax.Array] = None,       # i32[B]
    *,
    invalid_score_floor: float = -2.0,
    bucket: int = 16,
    block: int = 1 << 18,
) -> Tuple[jax.Array, jax.Array]:
    """Exact batched int4 top-k, pure XLA, bounded unpack transient.

    The production int4 dense channel. Unpacking the whole matrix costs 2 x
    [N, D] int8 temps (16 GB at 8M x 1024) and the Pallas kernel's in-VMEM
    unpack measured 3x slower than XLA's int8 matmuls on v5e (the per-block
    lane->sublane relayouts of the scale/mask vectors dominate —
    eval_results/fused_vs_bucketed_topk.json). This path unpacks one row
    block at a time under ``lax.map`` (transient = 2 x block x D int8), takes
    per-bucket maxima, then rescores the winning buckets' members — the same
    exactness construction as ``ops.topk.bucketed_masked_top_k_batch``, so ids
    match ``dense_scores_int4_batch`` + ``masked_top_k`` bit-exactly.
    """
    from ..ops.topk import NEG_INF

    n, d2 = packed.shape
    b = query_vecs.shape[0]
    q = query_vecs.astype(jnp.float32)
    q_absmax = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-12)
    q_scale = q_absmax / 127.0  # [B, 1]
    q_i8 = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)

    block = min(block, max(bucket, n))
    while block > 1024 and n % block:
        block //= 2
    # block must stay a bucket multiple: for small n the min() above sets
    # block = n, and a non-multiple-of-16 row count (e.g. n_loc on a 6-device
    # mesh) previously tripped the assert below — round up and pad instead
    block = ((block + bucket - 1) // bucket) * bucket
    n_pad = ((n + block - 1) // block) * block
    pk, sc, va, co = packed, scales, valid, collection_of
    if n_pad != n:
        pk = jnp.pad(pk, ((0, n_pad - n), (0, 0)))
        sc = jnp.pad(sc, (0, n_pad - n), constant_values=1.0)
        va = jnp.pad(va, (0, n_pad - n))
        if co is not None:
            co = jnp.pad(co, (0, n_pad - n), constant_values=-2)
    assert block % bucket == 0
    n_blocks = n_pad // block

    def block_maxima(args):
        p_blk, sc_blk, va_blk, co_blk = args
        low, high = unpack_int4(p_blk)
        acc = jnp.dot(q_i8[:, :d2], low.T, preferred_element_type=jnp.int32)
        acc += jnp.dot(q_i8[:, d2:], high.T, preferred_element_type=jnp.int32)
        s = acc.astype(jnp.float32) * sc_blk[None, :] * q_scale  # [B, block]
        bad = ~va_blk[None, :] | (s <= invalid_score_floor)
        if co is not None:
            bad = bad | ((coll_cid[:, None] != -1) & (co_blk[None, :] != coll_cid[:, None]))
        s = jnp.where(bad, NEG_INF, s)
        return jnp.max(s.reshape(b, block // bucket, bucket), axis=2)

    co_blocks = (
        co.reshape(n_blocks, block)
        if co is not None
        else jnp.zeros((n_blocks, 1), jnp.int32)  # unused dummy
    )
    bmax = jax.lax.map(
        block_maxima,
        (pk.reshape(n_blocks, block, d2), sc.reshape(n_blocks, block),
         va.reshape(n_blocks, block), co_blocks),
    )  # [n_blocks, B, block/bucket]
    bmax = bmax.transpose(1, 0, 2).reshape(b, n_pad // bucket)

    kk = min(k, n_pad // bucket)
    _, bucket_ids = jax.lax.top_k(bmax, kk)
    member = (
        bucket_ids[:, :, None] * bucket
        + jnp.arange(bucket, dtype=bucket_ids.dtype)[None, None, :]
    ).reshape(b, kk * bucket)
    rows = jnp.clip(member, 0, n_pad - 1)
    low_m, high_m = unpack_int4(pk[rows])  # i8[B, C, D/2]
    acc = jnp.einsum("bcd,bd->bc", low_m.astype(jnp.int32),
                     q_i8[:, :d2].astype(jnp.int32))
    acc += jnp.einsum("bcd,bd->bc", high_m.astype(jnp.int32),
                      q_i8[:, d2:].astype(jnp.int32))
    cand = acc.astype(jnp.float32) * sc[rows] * q_scale
    ok = va[rows] & (member < n) & (cand > invalid_score_floor)
    if co is not None:
        ok = ok & ((coll_cid[:, None] == -1) | (co[rows] == coll_cid[:, None]))
    cand = jnp.where(ok, cand, NEG_INF)
    sort_ids = jnp.where(cand > NEG_INF, member, jnp.iinfo(jnp.int32).max)
    _, sorted_ids, sorted_vals = jax.lax.sort(
        (-cand, sort_ids, cand), dimension=-1, num_keys=2
    )
    if sorted_ids.shape[1] < k:
        pad = ((0, 0), (0, k - sorted_ids.shape[1]))
        sorted_ids = jnp.pad(sorted_ids, pad)
        sorted_vals = jnp.pad(sorted_vals, pad, constant_values=NEG_INF)
    top_ids, top_vals = sorted_ids[:, :k], sorted_vals[:, :k]
    okk = top_vals > NEG_INF
    return (
        jnp.where(okk, top_ids, -1).astype(jnp.int32),
        jnp.where(okk, top_vals, NEG_INF),
    )


@jax.jit
def _dense_scores_int8(
    values: jax.Array, scales: jax.Array, query_vec: jax.Array
) -> jax.Array:
    """int8 x int8 -> int32 on the MXU, rescaled to cosine in f32."""
    q = query_vec.astype(jnp.float32)
    q_absmax = jnp.maximum(jnp.max(jnp.abs(q)), 1e-12)
    q_scale = q_absmax / 127.0
    q_i8 = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)
    acc = jnp.dot(values, q_i8, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * scales * q_scale


def dense_scores_int8_batch(
    values: jax.Array, scales: jax.Array, query_vecs: jax.Array
) -> jax.Array:
    """Batched int8 scoring f32[B, n_pad]."""
    q = query_vecs.astype(jnp.float32)
    q_absmax = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-12)
    q_scale = q_absmax / 127.0  # [B, 1]
    q_i8 = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)
    acc = jnp.dot(q_i8, values.T, preferred_element_type=jnp.int32)  # [B, n_pad]
    return acc.astype(jnp.float32) * scales[None, :] * q_scale


@jax.jit
def dense_scores_batch(embeddings: jax.Array, query_vecs: jax.Array) -> jax.Array:
    """Batched scoring f32[B, n_pad] — one (B, D) x (D, N) MXU matmul."""
    return jnp.dot(
        query_vecs.astype(embeddings.dtype), embeddings.T, preferred_element_type=jnp.float32
    )


def build_dense_index(
    vectors: np.ndarray,  # f32[N, D_full] raw embeddings (any norm)
    config: RAGConfig,
) -> DenseIndex:
    """Matryoshka-truncate, renormalize, pad to capacity, place in HBM."""
    n_docs = int(vectors.shape[0])
    dim = config.embedding_dim
    n_pad = config.round_capacity(max(n_docs, 1))

    mat = np.zeros((n_pad, dim), dtype=np.float32)
    if n_docs:
        mat[:n_docs] = truncate_matryoshka(vectors, dim)
    valid = np.zeros((n_pad,), dtype=bool)
    valid[:n_docs] = True

    if config.embedding_dtype in ("int8", "int4"):
        quantize = quantize_rows_int4 if config.embedding_dtype == "int4" else quantize_rows_int8
        values, scale = quantize(mat)
        return DenseIndex(
            embeddings=jnp.asarray(values), valid=jnp.asarray(valid),
            n_docs=n_docs, n_pad=n_pad, dim=dim, config=config,
            scales=jnp.asarray(scale),
        )
    dtype = jnp.bfloat16 if config.embedding_dtype == "bfloat16" else jnp.float32
    return DenseIndex(
        embeddings=jnp.asarray(mat, dtype=dtype),
        valid=jnp.asarray(valid),
        n_docs=n_docs,
        n_pad=n_pad,
        dim=dim,
        config=config,
    )
