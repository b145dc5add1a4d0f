"""On-mesh transformer encoder: the framework's native embedding/reranking model.

The reference delegates embedding to an external Qwen3-VL-Embedding server over HTTP
(``/root/reference/src/voice_agent/rag2/embedder.py:31-120``) and reranking to a
Qwen3-VL-Reranker server (``retrieval/reranker.py:287-313``). This module provides the
TPU-native counterpart: a compact bidirectional transformer that runs *batched on the same
mesh as the indexes*, producing

- a pooled Matryoshka-style sentence embedding (masked mean -> projection -> L2 norm;
  prefix-truncatable like the reference's 4096->1024 scheme), and
- per-token embeddings in a reduced dimension for true late-interaction MaxSim reranking
  (the capability the reference *names* but never implements — SURVEY.md §5.7).

Tokenization is the analyzer pipeline + stable hashing into a fixed bucket vocabulary, so
the model needs no tokenizer artifacts and any text maps deterministically onto device
arrays. Weights initialize deterministically; :mod:`training` provides the contrastive
(InfoNCE) training step with dp x tp sharding for fitting the encoder to a corpus.

Compute is bf16 on the MXU with f32 parameters/accumulation; shapes are static
(``max_tokens`` padding) so every batch hits the same compiled program.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..analyzer import Analyzer
from ..config import RAGConfig, get_settings

PAD_ID = 0  # reserved token id


@dataclass(frozen=True)
class EncoderConfig:
    vocab_buckets: int = 32768
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 8
    d_mlp: int = 1024
    max_tokens: int = 256
    out_dim: int = 2048  # pooled embedding dim (pre-Matryoshka truncation)
    token_dim: int = 128  # per-token dim for MaxSim
    dtype: str = "bfloat16"
    # Identity-anchor blend (squared weight of the deterministic component; 0 = off).
    # Each token vector becomes norm(a*dir(stem) + b*ctx): two occurrences of the
    # same lexeme then score cos >= ~a^2 regardless of context, which keeps the
    # rerank gate robust on text far from the training distribution — the trained
    # contextual part only ever ADDS similarity for paraphrases. Same idea at the
    # pooled level with a BoW-of-stem-directions component (the proven 0.85+
    # recall geometry) so the dense channel can never rank below lexical overlap.
    anchor_token_w2: float = 0.6
    anchor_pool_w2: float = 0.5

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def hash_token(token: str, buckets: int) -> int:
    """Stable token -> [1, buckets) hash (id 0 reserved for padding)."""
    h = int.from_bytes(hashlib.blake2s(token.encode("utf-8"), digest_size=8).digest(), "little")
    return 1 + (h % (buckets - 1))


class TextHasher:
    """Host-side text -> padded (ids, mask) arrays via the shared analyzer."""

    def __init__(self, enc_cfg: EncoderConfig, rag_cfg: Optional[RAGConfig] = None) -> None:
        self.cfg = enc_cfg
        self.analyzer = Analyzer(rag_cfg or get_settings())
        self._cache: dict[str, int] = {}

    _CACHE_CAP = 262144  # str->int memo; unbounded growth on ID-heavy corpora

    def _tid(self, token: str) -> int:
        v = self._cache.get(token)
        if v is None:
            if len(self._cache) > self._CACHE_CAP:
                self._cache.clear()
            v = hash_token(token, self.cfg.vocab_buckets)
            self._cache[token] = v
        return v

    def encode(self, texts: Sequence[str], max_tokens: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        t = max_tokens or self.cfg.max_tokens
        ids = np.zeros((len(texts), t), np.int32)
        mask = np.zeros((len(texts), t), bool)
        for i, text in enumerate(texts):
            toks = self.analyzer.tokenize(text)[:t]
            for j, tok in enumerate(toks):
                ids[i, j] = self._tid(tok)
                mask[i, j] = True
        return ids, mask


# ---------------------------------------------------------------------------
# Identity anchors: deterministic per-lexeme unit directions blended into both
# encoder heads. norm(a*dir(key) + b*ctx) guarantees two occurrences of the same
# lexeme (or of lexicon synonyms sharing a group key) score cos >= ~a^2
# regardless of context, so embeddings degrade to BoW-hash geometry — not to
# noise — on text far from the training distribution (regression: round-2's
# unanchored default refused every natural-text query the BowHash default
# accepted). Training blends the SAME anchors inside the loss (models/training),
# so the contextual part learns the residual semantics given the anchors.
# ---------------------------------------------------------------------------

_ANCHOR_DIR_CACHE: dict = {}
_SYN_KEY_CACHE: Optional[dict] = None


def _syn_key_map() -> dict:
    """stem-family -> synonym-group key from the training lexicon: single-word
    surface forms of one concept group (invoice/bill/fatura/cobranca) share one
    anchor direction, making the deterministic component itself carry the
    lexicon's EN<->PT synonymy."""
    global _SYN_KEY_CACHE
    if _SYN_KEY_CACHE is None:
        from ..analyzer import stem_family
        from .pretrain import CONCEPTS

        m: dict = {}
        for group, forms in CONCEPTS.items():
            for form in forms:
                words = form.split()
                if len(words) == 1:
                    m[stem_family(words[0])] = group
        _SYN_KEY_CACHE = m
    return _SYN_KEY_CACHE


def anchor_key(token: str) -> str:
    from ..analyzer import stem_family

    stem = stem_family(token)
    return _syn_key_map().get(stem, stem)


def anchor_dir(key: str, dim: int) -> np.ndarray:
    cache = _ANCHOR_DIR_CACHE.setdefault(dim, {})
    v = cache.get(key)
    if v is None:
        seed = int.from_bytes(
            hashlib.blake2s(("anchor:" + key).encode("utf-8"), digest_size=8).digest(),
            "little",
        )
        v = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
        v /= max(float(np.linalg.norm(v)), 1e-12)
        cache[key] = v
    return v


def anchor_arrays(
    texts: Sequence[str], enc_cfg: EncoderConfig, analyzer: Analyzer,
    max_tokens: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(pooled f32[B, out_dim], token f32[B, T, token_dim]) anchor components.

    Pooled anchor = L2-normalized sum of the text's lexeme directions (BoW-hash
    geometry); token anchors are per-position lexeme directions. Zero rows where
    a text has no tokens / at padding positions."""
    t = max_tokens or enc_cfg.max_tokens
    apool = np.zeros((len(texts), enc_cfg.out_dim), np.float32)
    atok = np.zeros((len(texts), t, enc_cfg.token_dim), np.float32)
    for i, text in enumerate(texts):
        toks = analyzer.tokenize(text)[:t]
        if not toks:
            continue
        for j, token in enumerate(toks):
            key = anchor_key(token)
            atok[i, j] = anchor_dir(key, enc_cfg.token_dim)
            apool[i] += anchor_dir(key, enc_cfg.out_dim)
        apool[i] /= max(float(np.linalg.norm(apool[i])), 1e-12)
    return apool, atok


def blend_anchors_np(
    enc_cfg: EncoderConfig, pooled: np.ndarray, tok: np.ndarray,
    apool: np.ndarray, atok: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Inference-side anchor blend; the exact numpy mirror of the in-loss blend."""
    a_t = float(np.sqrt(enc_cfg.anchor_token_w2))
    b_t = float(np.sqrt(1.0 - enc_cfg.anchor_token_w2))
    a_p = float(np.sqrt(enc_cfg.anchor_pool_w2))
    b_p = float(np.sqrt(1.0 - enc_cfg.anchor_pool_w2))
    has_tok = np.any(atok != 0, axis=-1, keepdims=True)  # [B, T, 1] anchor present
    t_mix = a_t * atok + b_t * tok
    t_norm = np.maximum(np.linalg.norm(t_mix, axis=-1, keepdims=True), 1e-12)
    tok = np.where(has_tok, t_mix / t_norm, tok)
    has_pool = np.any(apool != 0, axis=-1, keepdims=True)
    p_mix = a_p * apool + b_p * pooled
    p_norm = np.maximum(np.linalg.norm(p_mix, axis=-1, keepdims=True), 1e-12)
    return np.where(has_pool, p_mix / p_norm, pooled), tok


class Block(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        c = self.cfg
        dt = c.compute_dtype
        h = nn.LayerNorm(dtype=dt, name="ln_attn")(x)
        attn_mask = mask[:, None, None, :]  # [B, 1, 1, T] key mask
        h = nn.MultiHeadDotProductAttention(
            num_heads=c.n_heads, dtype=dt, name="attn",
        )(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm(dtype=dt, name="ln_mlp")(x)
        h = nn.Dense(c.d_mlp, dtype=dt, name="mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(c.d_model, dtype=dt, name="mlp_out")(h)
        return x + h


class Encoder(nn.Module):
    """Bidirectional transformer with pooled + token-level heads."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, token_ids: jax.Array, mask: jax.Array):
        c = self.cfg
        dt = c.compute_dtype
        x = nn.Embed(c.vocab_buckets, c.d_model, dtype=dt, name="tok_embed")(token_ids)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (c.max_tokens, c.d_model),
        )
        x = x + pos[None, : token_ids.shape[1], :].astype(dt)
        for i in range(c.n_layers):
            x = Block(c, name=f"block_{i}")(x, mask)
        x = nn.LayerNorm(dtype=dt, name="ln_final")(x)

        # pooled sentence embedding: masked mean -> projection -> L2 norm
        m = mask[..., None].astype(dt)
        denom = jnp.maximum(m.sum(axis=1), 1.0)
        pooled = (x * m).sum(axis=1) / denom
        pooled = nn.Dense(c.out_dim, dtype=dt, name="pool_proj")(pooled)
        pooled = pooled.astype(jnp.float32)
        pooled = pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-6)

        # token-level embeddings for MaxSim: reduced dim, unit-normalized, masked to 0
        tok = nn.Dense(c.token_dim, dtype=dt, name="token_proj")(x).astype(jnp.float32)
        tok = tok / jnp.maximum(jnp.linalg.norm(tok, axis=-1, keepdims=True), 1e-6)
        tok = tok * mask[..., None].astype(jnp.float32)
        return pooled, tok


def init_encoder(
    enc_cfg: EncoderConfig, seed: int = 0
) -> Tuple[Encoder, dict]:
    model = Encoder(enc_cfg)
    rng = jax.random.PRNGKey(seed)
    dummy_ids = jnp.zeros((1, enc_cfg.max_tokens), jnp.int32)
    dummy_mask = jnp.ones((1, enc_cfg.max_tokens), bool)
    params = model.init(rng, dummy_ids, dummy_mask)
    return model, params


from .embedder import _ImageHashMixin


class EncoderEmbedder(_ImageHashMixin):
    """Embedder-protocol adapter: batched on-device encoding.

    Satisfies :class:`~triple_hybrid_rag_tpu.models.embedder.Embedder`, so the retriever
    can swap the hash embedders for the real on-mesh model transparently. Image
    payloads route through the mixin's OCR-then-embed path (document images become
    text-retrievable via the same encoder; reference core/embedder.py:141-210).
    Trained weights define the space the visual aligner maps into, so this
    class opts into the cross-modal rung (``_aligner_compatible``).
    """

    _aligner_compatible = True

    def __init__(
        self,
        enc_cfg: Optional[EncoderConfig] = None,
        rag_cfg: Optional[RAGConfig] = None,
        params: Optional[dict] = None,
        batch_size: int = 64,
        seed: int = 0,
    ) -> None:
        rag_cfg = rag_cfg or get_settings()
        self.enc_cfg = enc_cfg or EncoderConfig(
            vocab_buckets=rag_cfg.vocab_hash_buckets,
            out_dim=rag_cfg.embedding_dim_full,
            token_dim=rag_cfg.maxsim_dim,
        )
        if params is not None:
            # skip the full random init + traced dummy forward when weights are
            # supplied (load_default_encoder already built a template tree —
            # the discarded second init was pure startup cost)
            self.model = Encoder(self.enc_cfg)
            self.params = params
        else:
            self.model, self.params = init_encoder(self.enc_cfg, seed)
        self.hasher = TextHasher(self.enc_cfg, rag_cfg)
        self.batch_size = batch_size
        self.dim = self.enc_cfg.out_dim
        self._encode = jax.jit(
            lambda p, ids, mask: self.model.apply(p, ids, mask)
        )
        self._query_enc_cache: dict = {}

    @property
    def maxsim_calibration(self) -> float:
        """Divisor renormalizing anchored MaxSim scores so exact match ~ 1.0
        (see ``ops.maxsim.calibrate_maxsim``); 1.0 = no anchors, no rescale."""
        w2 = self.enc_cfg.anchor_token_w2
        return float(w2) if w2 > 0 else 1.0

    def _run(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        pooled_out: List[np.ndarray] = []
        tokens_out: List[np.ndarray] = []
        bs = self.batch_size
        for i in range(0, len(texts), bs):
            batch = list(texts[i : i + bs])
            ids, mask = self.hasher.encode(batch)
            pooled, tok = self._encode(self.params, jnp.asarray(ids), jnp.asarray(mask))
            pooled, tok = np.asarray(pooled).copy(), np.asarray(tok).copy()
            if self.enc_cfg.anchor_token_w2 > 0 or self.enc_cfg.anchor_pool_w2 > 0:
                apool, atok = anchor_arrays(batch, self.enc_cfg, self.hasher.analyzer)
                pooled, tok = blend_anchors_np(self.enc_cfg, pooled, tok, apool, atok)
            pooled_out.append(np.asarray(pooled))
            tokens_out.append(np.asarray(tok))
        return (
            np.concatenate(pooled_out) if pooled_out else np.zeros((0, self.dim), np.float32),
            np.concatenate(tokens_out)
            if tokens_out
            else np.zeros((0, self.enc_cfg.max_tokens, self.enc_cfg.token_dim), np.float32),
        )

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        return self._run(texts)[0]

    def embed_query(self, text: str) -> np.ndarray:
        # guard on the TOKEN count: with trained weights a token-less input
        # yields pooled = normalized(pool_proj bias) — a fixed NONZERO direction
        # — so the old any(out)!=0 check never fired and every stopword-only
        # query confidently retrieved whatever lies near the bias direction
        ids, mask = self.hasher.encode([text])
        if not mask.any():
            raise ValueError(f"query produced no tokens to embed: {text!r}")
        return self._run([text])[0][0]

    def token_embeddings(
        self, texts: Sequence[str], max_tokens: Optional[int] = None, dim: Optional[int] = None
    ) -> np.ndarray:
        """f32[N, T, dim] unit token embeddings (MaxSim index build / query side).

        ``dim`` < token_dim prefix-truncates AND re-normalizes (Matryoshka
        semantics): without the renorm, cosines shrink by the truncated norm
        fraction (~dim/token_dim for near-isotropic vectors) and the 0.6 safety
        gate silently refuses everything at small maxsim_dim. Padded rows stay
        exactly zero so downstream masks keep working."""
        out = self._run(texts)[1]
        if max_tokens is not None:
            out = out[:, :max_tokens]
        if dim is not None and dim < out.shape[-1]:
            out = out[..., :dim]
            norms = np.linalg.norm(out, axis=-1, keepdims=True)
            out = np.where(norms > 1e-9, out / np.maximum(norms, 1e-9), 0.0)
        return out

    def _query_enc_fn(self, out_dim: int, max_tokens: int, token_dim: int):
        """Jitted single-dispatch query encoding: forward + anchor blend +
        Matryoshka truncation, emitting the engine's f16 wire dtypes. Device
        mirror of ``embed_texts``/``token_embeddings`` (parity-tested)."""
        key = (out_dim, max_tokens, token_dim)
        fn = self._query_enc_cache.get(key)
        if fn is not None:
            return fn
        cfg = self.enc_cfg
        a_t = float(np.sqrt(cfg.anchor_token_w2))
        b_t = float(np.sqrt(1.0 - cfg.anchor_token_w2))
        a_p = float(np.sqrt(cfg.anchor_pool_w2))
        b_p = float(np.sqrt(1.0 - cfg.anchor_pool_w2))
        blend = cfg.anchor_token_w2 > 0 or cfg.anchor_pool_w2 > 0
        model = self.model

        def run(params, ids, mask, apool, atok):
            pooled, tok = model.apply(params, ids, mask)
            if blend:  # exact jnp mirror of blend_anchors_np
                has_tok = jnp.any(atok != 0, axis=-1, keepdims=True)
                t_mix = a_t * atok + b_t * tok
                t_norm = jnp.maximum(
                    jnp.linalg.norm(t_mix, axis=-1, keepdims=True), 1e-12
                )
                tok = jnp.where(has_tok, t_mix / t_norm, tok)
                has_pool = jnp.any(apool != 0, axis=-1, keepdims=True)
                p_mix = a_p * apool + b_p * pooled
                p_norm = jnp.maximum(
                    jnp.linalg.norm(p_mix, axis=-1, keepdims=True), 1e-12
                )
                pooled = jnp.where(has_pool, p_mix / p_norm, pooled)
            if out_dim < pooled.shape[-1]:  # truncate_matryoshka semantics
                pooled = pooled[:, :out_dim]
                pooled = pooled / jnp.maximum(
                    jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
                )
            tok = tok[:, :max_tokens]
            if token_dim < tok.shape[-1]:  # token_embeddings truncation + renorm
                tok = tok[..., :token_dim]
                norms = jnp.linalg.norm(tok, axis=-1, keepdims=True)
                tok = jnp.where(norms > 1e-9, tok / jnp.maximum(norms, 1e-9), 0.0)
            return pooled.astype(jnp.float16), tok.astype(jnp.float16)

        fn = jax.jit(run)
        self._query_enc_cache[key] = fn
        return fn

    def encode_queries_device(
        self, texts: Sequence[str], *, out_dim: int, max_tokens: int, token_dim: int
    ):
        """ONE async device dispatch encoding a query batch for the serving engine.

        Returns ``(pooled f16[B, out_dim], tok f16[B, T, token_dim], mask bool[B, T])``
        where pooled/tok are **device** arrays (not fetched — the caller feeds them
        straight into the search program so the host never blocks on the encoder)
        and mask is the host-side token-occupancy mask (identical to
        ``np.any(tok != 0, -1)`` because padding positions stay exactly zero).

        Replaces the prepare_queries double round trip (``embed_texts`` +
        ``token_embeddings`` each dispatched AND fetched the same forward): over a
        tunneled dev chip each fetch costs the ~25 ms round-trip floor, which made
        single-query p50 ~4x the dispatch floor. The reference never had this
        problem only because its embedder was a remote HTTP call with one round
        trip (rag2/embedder.py:226); this is the TPU-native equivalent."""
        t = min(max_tokens, self.enc_cfg.max_tokens)
        ids, mask = self.hasher.encode(texts)
        apool, atok = anchor_arrays(texts, self.enc_cfg, self.hasher.analyzer)
        fn = self._query_enc_fn(out_dim, t, token_dim)
        pooled, tok = fn(
            self.params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            jnp.asarray(apool),
            jnp.asarray(atok),
        )
        return pooled, tok, mask[:, :t]


def save_encoder_params(params, path) -> None:
    """Persist encoder params as an npz of flattened paths (no orbax dependency;
    the model-weights half of checkpointing — index artifacts live in index/checkpoint)."""
    import numpy as np

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        flat[name] = np.asarray(leaf)
    np.savez_compressed(path, **flat)


def load_encoder_params(template_params, path):
    """Restore params saved by :func:`save_encoder_params` into the template's tree
    structure (shapes verified)."""
    import numpy as np

    npz = np.load(path)
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template_params)
    new_leaves = []
    for keypath, leaf in leaves_with_path:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        if name not in npz:
            raise KeyError(f"checkpoint missing parameter {name}")
        arr = npz[name]
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch for {name}: {arr.shape} vs {leaf.shape}")
        new_leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
