"""Contrastive training for the on-mesh encoder (dp x tp sharded).

The reference has no training loop — its embedder/reranker are frozen external models.
A standalone TPU framework must be able to *fit* its encoder to a corpus, so this module
provides symmetric-InfoNCE contrastive training over (query, positive-passage) pairs —
the standard recipe for retrieval embedders — as a single jitted SPMD step:

- **dp**: the batch shards over the ``dp`` mesh axis; the in-batch-negatives logits
  matrix ``q @ d.T`` contracts over the full batch via XLA-inserted collectives.
- **tp**: attention heads and MLP hidden dims shard over ``tp`` via parameter
  ``NamedSharding`` placement (GSPMD propagates through the forward/backward pass).

Parameters/optimizer state are placed once with :func:`shard_train_state`; the compiled
step then runs with compiler-inserted all-reduces (psum of gradients over ``dp``,
activation collectives over ``tp``) — no hand-written communication.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .encoder import Encoder, EncoderConfig, init_encoder


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    temperature: float = 0.05
    warmup_steps: int = 100
    decay_steps: int = 10_000  # cosine horizon; set ~= total steps so runs end decayed
    # Matryoshka prefix training (reference semantics: prefix-truncate + renormalize,
    # rag2/embedder.py:40-68): InfoNCE is averaged over these pooled-embedding prefix
    # widths so truncated vectors stay retrieval-quality. () = full width only.
    matryoshka_dims: Tuple[int, ...] = ()
    # weight of the token-level MaxSim InfoNCE term (trains the late-interaction head,
    # ColBERT-style); 0 = pooled-only training.
    maxsim_weight: float = 0.0


def training_mesh(n_devices: Optional[int] = None, tp: int = 2) -> Mesh:
    """dp x tp mesh over the visible devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    tp = min(tp, n)
    dp = n // tp
    grid = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def _param_spec(path: Tuple, leaf) -> P:
    """Tensor-parallel layout rules keyed on parameter path names.

    Column-parallel in (shard the expanding dim), row-parallel out (shard the
    contracting dim) — the standard Megatron-style MLP/attention split.
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    ndim = getattr(leaf, "ndim", 0)
    if "mlp_in" in joined and "kernel" in joined:
        return P(None, "tp")
    if "mlp_out" in joined and "kernel" in joined:
        return P("tp", None)
    if "attn" in joined and "kernel" in joined and ndim == 3:
        # qkv projections [d_model, heads, head_dim] -> shard heads
        if "out" in joined:
            return P("tp", None, None)  # out proj [heads, head_dim, d_model]
        return P(None, "tp", None)
    if "pool_proj" in joined and "kernel" in joined:
        return P(None, "tp")
    if "token_proj" in joined and "kernel" in joined:
        return P(None, "tp")
    return P()  # replicate everything else (embeddings, norms, biases)


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf)), params
    )


def shard_train_state(state: train_state.TrainState, mesh: Mesh) -> train_state.TrainState:
    """Place params and matching optimizer moments with tp shardings; replicate the rest."""
    specs = param_shardings(state.params, mesh)

    def place_like_params(tree):
        return jax.tree.map(lambda leaf, s: jax.device_put(leaf, s), tree, specs)

    new_opt = []
    for piece in state.opt_state:
        if hasattr(piece, "mu") and hasattr(piece, "nu"):
            piece = piece._replace(
                mu=place_like_params(piece.mu), nu=place_like_params(piece.nu)
            )
        new_opt.append(piece)
    return state.replace(
        params=place_like_params(state.params), opt_state=tuple(new_opt)
    )


def create_train_state(
    enc_cfg: EncoderConfig,
    train_cfg: TrainConfig = TrainConfig(),
    seed: int = 0,
    mesh: Optional[Mesh] = None,
) -> Tuple[Encoder, train_state.TrainState]:
    model, params = init_encoder(enc_cfg, seed)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, train_cfg.learning_rate, train_cfg.warmup_steps, train_cfg.decay_steps
    )
    tx = optax.adamw(schedule, weight_decay=train_cfg.weight_decay)
    state = train_state.TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    if mesh is not None:
        state = shard_train_state(state, mesh)
    return model, state


def make_train_step(model: Encoder, train_cfg: TrainConfig, mesh: Optional[Mesh] = None):
    """Compiled symmetric-InfoNCE step.

    batch: (q_ids, q_mask, q_apool, q_atok, d_ids, d_mask, d_apool, d_atok) —
    ids/mask [B, T] plus the host-computed identity-anchor arrays
    (``encoder.anchor_arrays``), sharded P('dp', None) when a mesh is given. The
    loss blends the anchors exactly as inference does (``blend_anchors_np``), so
    the contextual weights are optimized FOR the blended embedding that serving
    actually uses — training through the anchor, not beside it.
    Returns (new_state, metrics dict)."""
    temp = train_cfg.temperature
    enc_cfg = model.cfg
    a_t = float(np.sqrt(enc_cfg.anchor_token_w2))
    b_t = float(np.sqrt(1.0 - enc_cfg.anchor_token_w2))
    a_p = float(np.sqrt(enc_cfg.anchor_pool_w2))
    b_p = float(np.sqrt(1.0 - enc_cfg.anchor_pool_w2))

    def _info_nce(q, d):
        logits = (q @ d.T) / temp  # [B, B]; in-batch negatives
        labels = jnp.arange(logits.shape[0])
        l_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        l_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
        return 0.5 * (l_qd + l_dq), logits

    def _blend(pooled, tok, apool, atok):
        if enc_cfg.anchor_token_w2 > 0:
            has = jnp.any(atok != 0, axis=-1, keepdims=True)
            mix = a_t * atok + b_t * tok
            # sum-of-squares + eps, NOT linalg.norm: padded token rows are exactly
            # zero and norm's gradient at 0 is NaN (0 * NaN = NaN poisons the loss)
            mix = mix * jax.lax.rsqrt(
                jnp.sum(jnp.square(mix), axis=-1, keepdims=True) + 1e-12
            )
            tok = jnp.where(has, mix, tok)
        if enc_cfg.anchor_pool_w2 > 0:
            # pooled blend stays UN-normalized here: the Matryoshka loop below
            # prefix-truncates then normalizes, matching inference (embed -> blend
            # -> truncate_matryoshka)
            has = jnp.any(apool != 0, axis=-1, keepdims=True)
            pooled = jnp.where(has, a_p * apool + b_p * pooled, pooled)
        return pooled, tok

    def loss_fn(params, q_ids, q_mask, q_apool, q_atok, d_ids, d_mask, d_apool, d_atok):
        q, q_tok = model.apply(params, q_ids, q_mask)
        d, d_tok = model.apply(params, d_ids, d_mask)
        q, q_tok = _blend(q, q_tok, q_apool, q_atok)
        d, d_tok = _blend(d, d_tok, d_apool, d_atok)
        dims = train_cfg.matryoshka_dims or (q.shape[-1],)
        loss = 0.0
        logits = None
        for dim in dims:
            qp = q[:, :dim]
            dp_ = d[:, :dim]
            qp = qp / jnp.maximum(jnp.linalg.norm(qp, axis=-1, keepdims=True), 1e-6)
            dp_ = dp_ / jnp.maximum(jnp.linalg.norm(dp_, axis=-1, keepdims=True), 1e-6)
            l, lg = _info_nce(qp, dp_)
            loss = loss + l / len(dims)
            if logits is None:  # accuracy reported at the full width
                logits = lg
        if train_cfg.maxsim_weight > 0:
            # token-level late-interaction InfoNCE: score(i, j) = mean over i's query
            # tokens of their best match among j's doc tokens (ColBERT objective) —
            # this is what makes the MaxSim rerank head genuinely trained
            sim = jnp.einsum("iqd,jtd->ijqt", q_tok, d_tok)  # [B, B, Tq, Td]
            best = jnp.max(sim, axis=-1)  # [B, B, Tq]
            qm = q_mask.astype(jnp.float32)
            denom = jnp.maximum(qm.sum(axis=1), 1.0)  # [B]
            ms = (best * qm[:, None, :]).sum(axis=-1) / denom[:, None]  # [B, B]
            labels = jnp.arange(ms.shape[0])
            l_ms = optax.softmax_cross_entropy_with_integer_labels(ms / temp, labels).mean()
            loss = loss + train_cfg.maxsim_weight * l_ms
        labels = jnp.arange(logits.shape[0])
        acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
        return loss, acc

    def step(state: train_state.TrainState, q_ids, q_mask, q_apool, q_atok,
             d_ids, d_mask, d_apool, d_atok):
        if mesh is not None:
            bspec = NamedSharding(mesh, P("dp", None))
            q_ids = jax.lax.with_sharding_constraint(q_ids, bspec)
            d_ids = jax.lax.with_sharding_constraint(d_ids, bspec)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, q_ids, q_mask, q_apool, q_atok, d_ids, d_mask, d_apool, d_atok
        )
        new_state = state.apply_gradients(grads=grads)
        return new_state, {"loss": loss, "accuracy": acc}

    return jax.jit(step, donate_argnums=(0,))


def encode_batch_with_anchors(hasher, texts, enc_cfg: EncoderConfig):
    """(ids, mask, anchor_pool, anchor_tok) device-ready arrays for one text batch."""
    from .encoder import anchor_arrays

    ids, mask = hasher.encode(texts)
    apool, atok = anchor_arrays(texts, enc_cfg, hasher.analyzer)
    return (
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(apool), jnp.asarray(atok)
    )


def train_pairs(
    model: Encoder,
    state: train_state.TrainState,
    hasher,
    pairs,  # sequence of (query_text, positive_text)
    train_cfg: TrainConfig = TrainConfig(),
    batch_size: int = 32,
    epochs: int = 1,
    mesh: Optional[Mesh] = None,
    log_every: int = 0,
):
    """Simple host loop over pair batches (index-build-time fitting).

    Fewer pairs than ``batch_size`` shrink the batch instead of silently doing
    ZERO steps (the old loop range was empty and returned the untouched state
    with no warning); a tail batch of >= 2 pairs trains too (InfoNCE needs at
    least one in-batch negative, so a 1-pair tail is dropped)."""
    batch_size = max(2, min(batch_size, len(pairs)))
    step_fn = make_train_step(model, train_cfg, mesh)
    metrics = {}
    step = 0
    for _ in range(epochs):
        for i in range(0, len(pairs), batch_size):
            batch = pairs[i : i + batch_size]
            if len(batch) < 2:
                continue  # InfoNCE needs an in-batch negative
            q_batch = encode_batch_with_anchors(hasher, [q for q, _ in batch], model.cfg)
            d_batch = encode_batch_with_anchors(hasher, [d for _, d in batch], model.cfg)
            state, metrics = step_fn(state, *q_batch, *d_batch)
            if log_every and step % log_every == 0:
                print(
                    f"train_pairs step {step}: loss={float(metrics['loss']):.4f} "
                    f"acc={float(metrics.get('accuracy', 0.0)):.3f}"
                )
            step += 1
    return state, {k: float(v) for k, v in metrics.items()}
