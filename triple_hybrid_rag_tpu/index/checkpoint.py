"""Index-artifact checkpointing: save/restore the corpus + derived state.

The reference's persistence *is* Postgres — documents, chunks, vectors, entities live in
tables and survive restarts; re-ingestion is idempotent by content hash (SURVEY.md §5.4).
Here the system of record is the host CorpusStore + EntityStore + embedding map; this
module serializes them (and the config they were built under) so a process can restore
and rebuild device indexes without re-ingesting:

- ``corpus.pkl`` / ``entities.pkl`` — host stores (documents, chunks, triples),
- ``embeddings.npz`` — chunk_id -> full-dim embedding matrix (pre-Matryoshka, so the
  restore can re-truncate under a different ``embedding_dim`` — the backfill/migration
  analogue of ``scripts/backfill_rag2.py``),
- ``manifest.json`` — config snapshot, counts, content hash of each artifact.

Loading verifies artifact hashes (corruption detection) and config compatibility.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import pickle
import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import RAGConfig
from ..corpus import CorpusStore
from ..models.entity_extractor import EntityStore

MANIFEST = "manifest.json"
FORMAT_VERSION = 1


def _sha256_file(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


class CheckpointError(RuntimeError):
    pass


def save_checkpoint(
    directory: str | Path,
    corpus: CorpusStore,
    entity_store: Optional[EntityStore] = None,
    embeddings: Optional[Dict[str, np.ndarray]] = None,
    config: Optional[RAGConfig] = None,
) -> Path:
    """Write all index-source artifacts; atomic via temp-then-rename of the manifest."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)

    with open(directory / "corpus.pkl", "wb") as f:
        pickle.dump(corpus.to_state(), f)
    with open(directory / "entities.pkl", "wb") as f:
        pickle.dump(entity_store, f)

    emb_path = directory / "embeddings.npz"
    if embeddings:
        ids = list(embeddings.keys())
        mat = np.stack([embeddings[i] for i in ids]).astype(np.float32)
        np.savez_compressed(emb_path, chunk_ids=np.array(ids), vectors=mat)
    else:
        np.savez_compressed(
            emb_path, chunk_ids=np.array([], dtype=str), vectors=np.zeros((0, 1), np.float32)
        )

    artifacts = {}
    for name in ("corpus.pkl", "entities.pkl", "embeddings.npz"):
        artifacts[name] = _sha256_file(directory / name)

    manifest = {
        "format_version": FORMAT_VERSION,
        "created_at": time.time(),
        "stats": corpus.stats(),
        "entity_stats": entity_store.stats() if entity_store else {},
        "config": dataclasses.asdict(config) if config else None,
        "artifacts": artifacts,
    }
    tmp = directory / (MANIFEST + ".tmp")
    tmp.write_text(json.dumps(manifest, indent=2))
    tmp.replace(directory / MANIFEST)
    return directory


def load_checkpoint(
    directory: str | Path,
    verify: bool = True,
) -> Tuple[CorpusStore, Optional[EntityStore], Dict[str, np.ndarray], Optional[RAGConfig]]:
    """Restore artifacts; raises CheckpointError on missing/corrupt data."""
    directory = Path(directory)
    mpath = directory / MANIFEST
    if not mpath.exists():
        raise CheckpointError(f"no checkpoint manifest at {directory}")
    manifest = json.loads(mpath.read_text())
    if manifest.get("format_version") != FORMAT_VERSION:
        raise CheckpointError(
            f"checkpoint format {manifest.get('format_version')} != {FORMAT_VERSION}"
        )
    if verify:
        for name, want in manifest["artifacts"].items():
            p = directory / name
            if not p.exists():
                raise CheckpointError(f"missing artifact {name}")
            got = _sha256_file(p)
            if got != want:
                raise CheckpointError(f"artifact {name} hash mismatch (corrupt checkpoint)")

    with open(directory / "corpus.pkl", "rb") as f:
        corpus = CorpusStore.from_state(pickle.load(f))
    with open(directory / "entities.pkl", "rb") as f:
        entity_store = pickle.load(f)
    npz = np.load(directory / "embeddings.npz", allow_pickle=False)
    embeddings = {
        str(cid): vec for cid, vec in zip(npz["chunk_ids"], npz["vectors"])
    }
    cfg = None
    if manifest.get("config"):
        raw = dict(manifest["config"])
        for key in ("mesh_shape", "mesh_axis_names", "analyzer_languages"):
            if key in raw and isinstance(raw[key], list):
                raw[key] = tuple(raw[key])
        cfg = RAGConfig(**raw)
    return corpus, entity_store, embeddings, cfg


def save_ingestor(ingestor, directory: str | Path) -> Path:
    """Checkpoint an Ingestor's full state."""
    return save_checkpoint(
        directory, ingestor.corpus, ingestor.entity_store,
        ingestor.embeddings, ingestor.config,
    )


def load_ingestor(directory: str | Path, config: Optional[RAGConfig] = None):
    """Restore an Ingestor (and thereby a retriever via make_retriever()).

    Passing a different ``config`` (e.g. another ``embedding_dim``) re-derives device
    indexes under the new settings from the stored full-dim embeddings — the
    backfill/migration path."""
    from ..ingest import Ingestor

    corpus, entity_store, embeddings, saved_cfg = load_checkpoint(directory)
    ing = Ingestor(corpus=corpus, config=config or saved_cfg, entity_store=entity_store)
    ing.embeddings = embeddings
    return ing
