"""Cross-modal retrieval eval: text query -> document image (round-5 task #8).

Trains the visual aligner (``models/visual_align.py``) on rendered-docstring /
text pairs with the SHIPPED text encoder frozen, then measures text->image
recall@10 on a held-out image corpus under three image-embedding backends:

- **aligner**: pixels through the trained vision tower (this round's addition);
- **perceptual**: the round-4 luminance/histogram/gradient features (the
  documented image->image bound — expected to fail cross-modal);
- **ocr**: the OCR-then-embed ladder (glyph recognizer), the strongest
  hermetic baseline for rendered text.

Two query regimes per backend:

- ``visible``: the query sentence IS rendered in the target image (OCR can
  read it; tests the whole ladder fairly);
- ``cloze``: the query sentence is REMOVED from the rendered text — retrieval
  must bridge semantics, not read the answer off the pixels.

Reference bar: any image is embedded into the text space by Qwen3-VL
(core/embedder.py:141-210). This closes the rendered/document-image half of
that contract; natural-photo alignment remains a documented hermetic bound.

Usage (real chip): python scripts/eval_crossmodal.py [--train 1500] [--test 500]
Writes eval_results/crossmodal.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def split_sentences(text: str):
    return [s.strip() for s in text.replace("\n", " ").split(". ")
            if len(s.split()) >= 6]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", type=int, default=1500)
    ap.add_argument("--test", type=int, default=500)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min-len", type=int, default=260)
    ap.add_argument("--ocr-samples", type=int, default=120,
                    help="OCR ladder is host-side and slow; score a subsample")
    ap.add_argument("--save-weights", default=None,
                    help="optionally package weights (models/data/visual_aligner.npz)")
    ap.add_argument("--out", default="eval_results/crossmodal.json")
    args = ap.parse_args()

    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import _ast_documents
    from triple_hybrid_rag_tpu.models.embedder import get_default_embedder
    from triple_hybrid_rag_tpu.models.pretrain import TRAIN_TEXT_SOURCES_DEEP
    from triple_hybrid_rag_tpu.models.visual_align import (
        VisualAlignEmbedder,
        VisualAlignerConfig,
        render_training_pair,
        save_aligner,
        train_visual_aligner,
    )
    from triple_hybrid_rag_tpu.ocr_glyph import render_text_image

    cfg = RAGConfig(capacity_round=1024)
    rng = np.random.default_rng(args.seed)
    docs = _ast_documents(min_len=args.min_len,
                          max_docs=args.train + args.test,
                          exclude_top=TRAIN_TEXT_SOURCES_DEEP)
    train_texts = [t for _, t in docs[: args.train]]
    test_docs = docs[args.train : args.train + args.test]
    print(f"docs: {len(train_texts)} train / {len(test_docs)} test", flush=True)

    embedder = get_default_embedder(cfg)
    t0 = time.time()
    va_cfg = VisualAlignerConfig(out_dim=cfg.embedding_dim_full)
    params, va_cfg = train_visual_aligner(
        train_texts, embedder, cfg=va_cfg, steps=args.steps, batch=args.batch,
        seed=args.seed, log=lambda m: print(m, flush=True),
    )
    train_s = time.time() - t0
    print(f"aligner trained in {train_s:.0f}s", flush=True)
    aligner = VisualAlignEmbedder(params, va_cfg, out_dim=cfg.embedding_dim)
    if args.save_weights:
        save_aligner(params, va_cfg, args.save_weights)
        print(f"weights -> {args.save_weights}", flush=True)

    # ---- held-out image corpus + queries ----
    # per test doc: pick a query sentence; render two target variants
    queries, vis_pngs, cloze_pngs = [], [], []
    for name, text in test_docs:
        sents = split_sentences(text)
        if len(sents) < 2:
            continue
        qi = int(rng.integers(0, len(sents)))
        queries.append(sents[qi])
        vis_pngs.append(render_text_image(_wrap(text), width=640, font_size=12))
        held = ". ".join(s for i, s in enumerate(sents) if i != qi)
        cloze_pngs.append(render_text_image(_wrap(held), width=640, font_size=12))
    n = len(queries)
    print(f"image corpus: {n} docs", flush=True)

    qv = np.asarray(embedder.embed_texts(queries), np.float32)
    qv = qv[:, : cfg.embedding_dim]
    qv /= np.maximum(np.linalg.norm(qv, axis=-1, keepdims=True), 1e-6)

    from triple_hybrid_rag_tpu.models.visual_align import image_bytes_to_grid

    def recall_at(sims: np.ndarray, k: int) -> float:
        # target i is image i
        ranks = (sims > sims[np.arange(len(sims)), np.arange(len(sims))][:, None]).sum(1)
        return float(np.mean(ranks < k))

    results = {}
    for regime, pngs in (("visible", vis_pngs), ("cloze", cloze_pngs)):
        grids = np.stack([image_bytes_to_grid(p, va_cfg.image_size) for p in pngs])
        # aligner
        iv_chunks = [aligner.embed_grids(grids[i : i + 64])
                     for i in range(0, n, 64)]
        iv = np.concatenate(iv_chunks)
        results[f"aligner_{regime}_recall@{args.k}"] = recall_at(qv @ iv.T, args.k)
        # perceptual features (round-4 bound)
        pv = np.stack([
            _perceptual_vec(embedder, p, cfg.embedding_dim) for p in pngs
        ])
        results[f"perceptual_{regime}_recall@{args.k}"] = recall_at(qv @ pv.T, args.k)
        print(f"[{regime}] aligner={results[f'aligner_{regime}_recall@{args.k}']:.4f} "
              f"perceptual={results[f'perceptual_{regime}_recall@{args.k}']:.4f}",
              flush=True)

    # OCR ladder on a subsample (host-side glyph matching is slow)
    m = min(args.ocr_samples, n)
    t0 = time.time()
    ocr_vecs = np.stack([
        np.asarray(embedder.embed_images([vis_pngs[i]]))[0][: cfg.embedding_dim]
        for i in range(m)
    ])
    ocr_vecs /= np.maximum(np.linalg.norm(ocr_vecs, axis=-1, keepdims=True), 1e-6)
    sims = qv[:m] @ ocr_vecs.T
    results[f"ocr_visible_recall@{args.k}_n{m}"] = recall_at(sims, args.k)
    results["ocr_s_per_image"] = round((time.time() - t0) / m, 2)
    print(f"[ocr visible n={m}] recall@{args.k}="
          f"{results[f'ocr_visible_recall@{args.k}_n{m}']:.4f} "
          f"({results['ocr_s_per_image']}s/img)", flush=True)

    payload = {
        "n_train_texts": len(train_texts), "n_images": n, "k": args.k,
        "steps": args.steps, "train_s": round(train_s, 1),
        "aligner_cfg": {k: v for k, v in va_cfg.__dict__.items()},
        "results": results,
        "note": "rendered document images; natural-photo alignment remains a "
                "documented hermetic bound (models/embedder.py)",
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(f"-> {out}", flush=True)
    return 0


def _wrap(text: str, per_line: int = 72, max_lines: int = 22) -> str:
    words, lines, cur = text.split(), [], ""
    for w in words:
        if len(cur) + len(w) + 1 > per_line:
            lines.append(cur)
            cur = w
        else:
            cur = (cur + " " + w).strip()
        if len(lines) >= max_lines:
            break
    if cur and len(lines) < max_lines:
        lines.append(cur)
    return "\n".join(lines)


def _perceptual_vec(embedder, png: bytes, dim: int) -> np.ndarray:
    v = embedder._visual_image_vec(png)
    if v is None:
        return np.zeros(dim, np.float32)
    v = np.asarray(v, np.float32)[:dim]
    return v / max(float(np.linalg.norm(v)), 1e-6)


if __name__ == "__main__":
    raise SystemExit(main())
