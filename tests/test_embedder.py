"""Embedder tests: determinism, similarity structure, degradation ladder."""

import numpy as np
import pytest

from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.models.embedder import (
    BowHashEmbedder,
    FailSoftEmbedder,
    HashEmbedder,
)


def test_hash_embedder_deterministic_unit():
    e = HashEmbedder(dim=64)
    a = e.embed_query("hello world")
    b = e.embed_query("hello world")
    np.testing.assert_array_equal(a, b)
    assert np.isclose(np.linalg.norm(a), 1.0, atol=1e-5)
    c = e.embed_query("different")
    assert abs(a @ c) < 0.5  # near-orthogonal


def test_hash_embedder_batch_matches_single():
    e = HashEmbedder(dim=32)
    batch = e.embed_texts(["a", "b"])
    np.testing.assert_array_equal(batch[0], e.embed_query("a"))
    assert e.embed_texts([]).shape == (0, 32)


def test_bow_embedder_similarity_structure():
    e = BowHashEmbedder(dim=256, config=RAGConfig())
    a = e.embed_query("payment invoice billing schedule")
    b = e.embed_query("invoice payment for billing")
    c = e.embed_query("fox wildlife forest habitat")
    assert a @ b > 0.6  # shared vocabulary -> similar
    assert a @ c < 0.3  # disjoint vocabulary -> dissimilar


def test_bow_embedder_empty_text():
    e = BowHashEmbedder(dim=64, config=RAGConfig())
    assert not np.any(e.embed_texts(["the a of"])[0])  # all stopwords -> zero vector
    with pytest.raises(ValueError):
        e.embed_query("the a of")


def test_failsoft_wrapper_zero_vectors():
    class Flaky:
        dim = 16

        def embed_texts(self, texts):
            raise RuntimeError("bulk endpoint down")

        def embed_query(self, text):
            if "bad" in text:
                raise RuntimeError("boom")
            return np.ones(16, np.float32)

    e = FailSoftEmbedder(Flaky())
    out = e.embed_texts(["ok", "bad one", "ok2"])
    assert out.shape == (3, 16)
    assert np.all(out[1] == 0) and np.all(out[0] == 1)
    assert e.last_errors == [1]


# ---------------------------------------------------------------------------
# OCR-then-embed image path (document images become text-retrievable)
# ---------------------------------------------------------------------------


def test_image_with_text_embeds_like_its_text():
    """A rendered document image must land near the embedding of its own text —
    the reference's image domain is scanned documents (core/embedder.py:141-210),
    so textual semantics are the parity that matters."""
    pytest.importorskip("PIL")
    from triple_hybrid_rag_tpu.ocr_glyph import render_text_image

    e = BowHashEmbedder(dim=256)
    text = "Invoice payment terms thirty days net"
    img = render_text_image(text, width=600)
    v_img = e.embed_images([img])[0]
    v_txt = e.embed_texts([text])[0]
    v_txt = v_txt / np.linalg.norm(v_txt)
    cos = float(v_img @ v_txt)
    assert cos > 0.5, cos  # OCR'd text shares most tokens with the original


def test_image_without_text_falls_back_to_hash():
    """Non-decodable bytes keep the deterministic content-hash embedding
    (identical bytes => identical vector; dedup semantics preserved)."""
    e = BowHashEmbedder(dim=64)
    a = e.embed_images([b"\x00\x01notanimage", b"\x00\x01notanimage"])
    np.testing.assert_array_equal(a[0], a[1])
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)


def _photo_png(seed: int, brightness: float = 0.0, size: int = 96) -> bytes:
    """Synthetic 'photo': smooth low-frequency RGB noise (no recognizable text)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(seed)
    small = rng.uniform(0, 1, (6, 6, 3))
    img = Image.fromarray((small * 255).astype(np.uint8)).resize(
        (size, size), Image.BILINEAR
    )
    arr = np.clip(np.asarray(img, np.float32) + brightness * 255.0, 0, 255)
    buf = io.BytesIO()
    Image.fromarray(arr.astype(np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


def test_visual_fallback_similarity_structure():
    """Non-text images embed by perceptual features: a re-encoded/slightly
    brightened copy of a photo stays close under cosine, a different photo is
    farther, and the vector is deterministic (dedup semantics preserved)."""
    pytest.importorskip("PIL")
    e = BowHashEmbedder(dim=256)
    a = _photo_png(seed=1)
    a_bright = _photo_png(seed=1, brightness=0.06)
    b = _photo_png(seed=2)
    va = e._visual_image_vec(a)
    va2 = e._visual_image_vec(a)
    vab = e._visual_image_vec(a_bright)
    vb = e._visual_image_vec(b)
    assert va is not None and vab is not None and vb is not None
    np.testing.assert_array_equal(va, va2)
    np.testing.assert_allclose(np.linalg.norm(va), 1.0, rtol=1e-5)
    cos_near = float(va @ vab)
    cos_far = float(va @ vb)
    assert cos_near > 0.9, cos_near
    assert cos_near > cos_far + 0.2, (cos_near, cos_far)
    # end-to-end: embed_images routes an un-OCR-able image through the visual
    # path (not the orthogonal content hash) and stays deterministic
    out = e.embed_images([a, a])
    np.testing.assert_array_equal(out[0], out[1])
    assert abs(float(out[0] @ e._hash_image_vec(a))) < 0.5


def test_visual_fallback_undecodable_keeps_hash():
    e = BowHashEmbedder(dim=64)
    assert e._visual_image_vec(b"\x89PNG\r\n\x1a\nnot really") is None


def test_encoder_embedder_supports_images():
    from triple_hybrid_rag_tpu.models.encoder import EncoderEmbedder

    assert hasattr(EncoderEmbedder, "embed_images")
    assert hasattr(EncoderEmbedder, "embed_mixed")
