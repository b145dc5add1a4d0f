"""Cross-modal visual aligner: pixels -> the text encoder's embedding space.

The reference embeds ANY image into the same vector space as text through its
multimodal model (Qwen3-VL, ``/root/reference/triple-hybrid-rag/src/
triple_hybrid_rag/core/embedder.py:141-210``), so a text query retrieves a
figure by visual content. Hermetically there is no pretrained vision tower, so
rounds 1-4 bounded this capability at OCR-then-embed + perceptual features
(``models/embedder.py`` docstring). This module closes the documented gap for
the DOCUMENT-IMAGE domain the reference actually serves (scanned pages,
rendered reports, screenshots): a small patch-transformer vision encoder
trained contrastively against the FROZEN text encoder on (rendered image,
source text) pairs, so image embeddings land in the text space — genuine
pixel->text alignment learned in-image, not OCR.

TPU notes: the encoder is a fixed-shape [B, 96, 96] -> [B, out_dim] jitted
forward (patchify = one reshape, blocks reuse the text encoder's ``Block``
MXU-friendly attention), trained with the same InfoNCE recipe as the text
encoder (in-batch negatives, bidirectional).

Scope honesty: alignment quality is measured on RENDERED text images
(scripts/eval_crossmodal.py); natural-photo alignment (a cat photo retrieved
by "a cat") remains out of hermetic reach and is still documented as a bound.
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import RAGConfig, get_settings
from .encoder import Block, EncoderConfig

__all__ = [
    "VisualAlignerConfig",
    "VisualEncoder",
    "image_bytes_to_grid",
    "render_training_pair",
    "train_visual_aligner",
    "VisualAlignEmbedder",
    "save_aligner",
    "load_aligner",
    "DEFAULT_ALIGNER_PATH",
]

DEFAULT_ALIGNER_PATH = os.path.join(
    os.path.dirname(__file__), "data", "visual_aligner.npz"
)


@dataclass(frozen=True)
class VisualAlignerConfig:
    image_size: int = 96
    patch: int = 8
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 4
    d_ff: int = 1024
    out_dim: int = 1024
    temperature: float = 0.05


class VisualEncoder(nn.Module):
    """Patch transformer: f32[B, S, S] grayscale in [0,1] -> unit f32[B, out_dim]."""

    cfg: VisualAlignerConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        c = self.cfg
        b = images.shape[0]
        n = c.image_size // c.patch
        # patchify: one reshape/transpose, no convs — [B, n*n, patch*patch]
        x = images.reshape(b, n, c.patch, n, c.patch)
        x = x.transpose(0, 1, 3, 2, 4).reshape(b, n * n, c.patch * c.patch)
        # per-patch contrast normalization: rendering/scan brightness must not
        # carry signal
        x = x - x.mean(axis=-1, keepdims=True)
        x = x / jnp.maximum(x.std(axis=-1, keepdims=True), 1e-3)
        x = nn.Dense(c.d_model, name="patch_embed")(x)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (n * n, c.d_model)
        )
        x = x + pos[None]
        ecfg = EncoderConfig(
            d_model=c.d_model, n_layers=c.n_layers, n_heads=c.n_heads,
            d_mlp=c.d_ff, out_dim=c.out_dim, max_tokens=n * n,
        )
        mask = jnp.ones((b, n * n), bool)
        for i in range(c.n_layers):
            x = Block(ecfg, name=f"block_{i}")(x, mask)
        x = nn.LayerNorm(name="ln_final")(x)
        pooled = x.mean(axis=1)
        pooled = nn.Dense(c.out_dim, name="proj")(pooled).astype(jnp.float32)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-6
        )


def image_bytes_to_grid(data: bytes, size: int = 96) -> Optional[np.ndarray]:
    """Decode any PIL-readable payload to the aligner's f32[S, S] input grid."""
    try:
        from PIL import Image

        img = Image.open(io.BytesIO(data)).convert("L")
        img = img.resize((size, size), Image.BILINEAR)
        return np.asarray(img, np.float32) / 255.0
    except Exception:
        return None


def render_training_pair(
    text: str, rng: np.random.Generator, size: int = 96
) -> Optional[np.ndarray]:
    """Render ``text`` as a document image with augmentations (font size, page
    width, margin, noise, contrast) and return the input grid."""
    from ..ocr_glyph import render_text_image

    width = int(rng.choice([380, 520, 680, 800]))
    font = int(rng.choice([10, 12, 14, 17]))
    margin = int(rng.integers(6, 28))
    # wrap into lines that fit the width at ~0.55*font px per char
    per_line = max(16, int(width / (0.55 * font)))
    words, lines, cur = text.split(), [], ""
    for w in words:
        if len(cur) + len(w) + 1 > per_line:
            lines.append(cur)
            cur = w
        else:
            cur = (cur + " " + w).strip()
        if len(lines) >= 18:
            break
    if cur and len(lines) < 18:
        lines.append(cur)
    if not lines:
        return None
    png = render_text_image("\n".join(lines), width=width, font_size=font,
                            margin=margin)
    grid = image_bytes_to_grid(png, size=size)
    if grid is None:
        return None
    if rng.random() < 0.5:  # speckle noise (scan artifacts)
        noise = rng.random(grid.shape) < 0.01
        grid = np.where(noise, rng.random(grid.shape).astype(np.float32), grid)
    if rng.random() < 0.5:  # contrast/brightness jitter
        grid = np.clip(
            grid * float(rng.uniform(0.7, 1.1)) + float(rng.uniform(-0.1, 0.1)),
            0.0, 1.0,
        ).astype(np.float32)
    return grid.astype(np.float32)


def train_visual_aligner(
    texts: Sequence[str],
    text_embedder,
    cfg: Optional[VisualAlignerConfig] = None,
    steps: int = 1200,
    batch: int = 64,
    lr: float = 3e-4,
    seed: int = 0,
    renders_per_text: int = 2,
    log=None,
):
    """Contrastive training: render each text, pull its image embedding toward
    the FROZEN text embedding, push from in-batch negatives (bidirectional
    InfoNCE — the text encoder's own pretraining recipe, models/training.py)."""
    import optax

    cfg = cfg or VisualAlignerConfig()
    rng = np.random.default_rng(seed)
    texts = [t for t in texts if len(t.split()) >= 6]
    if log:
        log(f"rendering {len(texts)} texts x{renders_per_text} ...")
    grids, tvecs = [], []
    tv = np.asarray(text_embedder.embed_texts(list(texts)), np.float32)
    for i, t in enumerate(texts):
        for _ in range(renders_per_text):
            g = render_training_pair(t, rng, size=cfg.image_size)
            if g is not None:
                grids.append(g)
                tvecs.append(tv[i])
    grids = np.stack(grids)
    tvecs = np.stack(tvecs)
    if log:
        log(f"training pairs: {len(grids)}")

    model = VisualEncoder(cfg)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((2, cfg.image_size, cfg.image_size)))
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps), weight_decay=1e-4)
    opt_state = tx.init(params)
    temp = cfg.temperature

    @jax.jit
    def step(params, opt_state, imgs, tv):
        def loss_fn(p):
            iv = model.apply(p, imgs)
            logits = iv @ tv.T / temp  # [B, B]
            labels = jnp.arange(imgs.shape[0])
            l_i = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            l_t = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
            return (l_i.mean() + l_t.mean()) * 0.5

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(grids)
    for s in range(steps):
        idx = rng.choice(n, size=min(batch, n), replace=False)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(grids[idx]), jnp.asarray(tvecs[idx])
        )
        if log and (s % 100 == 0 or s == steps - 1):
            log(f"  step {s}: loss {float(loss):.4f}")
    return params, cfg


def save_aligner(params, cfg: VisualAlignerConfig, path: str = DEFAULT_ALIGNER_PATH):
    flat = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
        flat["/".join(str(getattr(k, "key", k)) for k in kp)] = np.asarray(leaf)
    meta = {f"__cfg_{k}": np.asarray(v) for k, v in cfg.__dict__.items()}
    np.savez(path, **flat, **meta)


def load_aligner(path: str = DEFAULT_ALIGNER_PATH):
    """(params, cfg) or None if no weights are packaged at ``path``."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        kw = {}
        flat = {}
        for k in z.files:
            if k.startswith("__cfg_"):
                v = z[k]
                name = k[len("__cfg_"):]
                kw[name] = float(v) if name == "temperature" else int(v)
            else:
                flat[k] = z[k]
    cfg = VisualAlignerConfig(**kw)
    params: dict = {}
    for k, v in flat.items():
        node = params
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return params, cfg


class VisualAlignEmbedder:
    """Batched image->text-space embedding over trained aligner weights."""

    def __init__(self, params, cfg: VisualAlignerConfig,
                 out_dim: Optional[int] = None) -> None:
        self.cfg = cfg
        self.params = params
        self.out_dim = out_dim or cfg.out_dim
        model = VisualEncoder(cfg)
        self._apply = jax.jit(model.apply)

    def embed_grids(self, grids: np.ndarray) -> np.ndarray:
        out = np.asarray(self._apply(self.params, jnp.asarray(grids)))
        if self.out_dim < out.shape[-1]:  # Matryoshka prefix + renorm
            out = out[:, : self.out_dim]
            out /= np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-6)
        return out

    def embed_image_bytes(self, data: bytes) -> Optional[np.ndarray]:
        g = image_bytes_to_grid(data, size=self.cfg.image_size)
        if g is None:
            return None
        return self.embed_grids(g[None])[0]
