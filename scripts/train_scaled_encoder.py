"""Train the round-4 scaled encoder (~43M params) on the real chip.

The round-3 verdict's task #1: the packaged 5M encoder is the measured dense-channel
bottleneck (dense-only recall@10 0.318 < 0.35 on the 1500-doc corpus); the fix is a
30-100M model (reference bar: a 2B served embedder,
/root/reference/src/voice_agent/rag2/embedder.py:31-120) trained with BM25-error
hard-negative mining. Recipe:

- architecture: models.pretrain.scaled_encoder_config (d512/L8/H8/mlp2048/T96)
- mixture: paraphrase 0.15 / overlap 0.20 / realtext cloze 0.40 / BM25-confusable
  hard-negative groups 0.25 over the round-4 DEEP pool (~35k docs, full-depth AST
  harvest of 47 eval-disjoint packages — pretrain.TRAIN_TEXT_SOURCES_DEEP)
- asymmetric widths: queries 32 tokens, documents 96 (docs train at the inference
  width so every position embedding serving reads is trained)
- batch 256 (in-batch negatives scale with batch), lr 6e-4 cosine to ~0 at `steps`

Writes encoder_scaled.npz + a metrics JSON; promotion to the packaged default
(encoder.npz) happens only after the eval battery clears (see docs/STATUS.md).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np

from triple_hybrid_rag_tpu.models.pretrain import (
    DATA_DIR,
    load_default_encoder,
    paraphrase_recall_at_k,
    scaled_encoder_config,
    train_default_encoder,
)

OUT = DATA_DIR / "encoder_scaled.npz"
METRICS = Path("/root/repo/eval_results/encoder_scaled_train.json")


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    t0 = time.time()
    path, metrics = train_default_encoder(
        out_path=OUT,
        steps=steps,
        batch_size=256,
        seed=0,
        enc_cfg=scaled_encoder_config(),
        log_every=100,
        lr=6e-4,
        overlap_frac=0.20,
        realtext_frac=0.40,
        hardneg_frac=0.25,
        q_tokens=32,
        d_tokens=96,
        realtext_max_docs=35000,
        realtext_window=80,
        realtext_deep=True,
    )
    wall = time.time() - t0
    print(f"trained {steps} steps in {wall/60:.1f} min -> {path}", flush=True)

    from triple_hybrid_rag_tpu.config import RAGConfig

    enc = load_default_encoder(RAGConfig(encoder_params_path=str(OUT)))
    rec = paraphrase_recall_at_k(enc, k=10, n_docs=64, seed=2024)
    print(f"paraphrase holdout dense recall@10: {rec:.3f}", flush=True)

    METRICS.write_text(json.dumps({
        "steps": steps,
        "wall_minutes": wall / 60,
        "final_loss": metrics.get("loss"),
        "final_accuracy": metrics.get("accuracy"),
        "paraphrase_holdout_recall@10": rec,
        "recipe": {
            "batch_size": 256, "lr": 6e-4, "overlap_frac": 0.20,
            "realtext_frac": 0.40, "hardneg_frac": 0.25,
            "q_tokens": 32, "d_tokens": 96, "realtext_deep": True,
            "realtext_max_docs": 35000, "realtext_window": 80,
            "arch": "d512 L8 H8 mlp2048 T96 vocab32768 (~43M params)",
        },
    }, indent=2))
    print(f"metrics -> {METRICS}", flush=True)


if __name__ == "__main__":
    main()
