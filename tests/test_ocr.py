"""OCR tests: tile geometry, confidence heuristic, mode ladder, merge strategies
(reference tests/test_rag2_ocr_gundam.py coverage model — 28 tests of config + tiling math)."""

import struct

import pytest

from triple_hybrid_rag_tpu.ocr import (
    GundamTilingConfig,
    OCRConfig,
    OCRProcessor,
    calculate_tiles,
    estimate_confidence,
    image_size,
    merge_concat,
    merge_fuzzy,
    merge_vote,
    next_mode,
    should_use_gundam_tiling,
)


def make_png(w, h):
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h) + b"\x00" * 16


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def test_image_size_png_jpeg_gif():
    assert image_size(make_png(640, 480)) == (640, 480)
    jpeg = b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 10
    jpeg += b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 600, 800) + b"\x00" * 10
    assert image_size(jpeg) == (800, 600)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200)
    assert image_size(gif) == (320, 200)
    assert image_size(b"garbage") is None


def test_tiling_trigger():
    cfg = GundamTilingConfig()
    assert not should_use_gundam_tiling(1000, 800, cfg)
    assert should_use_gundam_tiling(1600, 800, cfg)
    assert should_use_gundam_tiling(800, 1500, cfg)


def test_tile_layout_small_image_single_tile():
    cfg = GundamTilingConfig()
    assert calculate_tiles(800, 600, cfg) == [(0, 0, 800, 600)]


def test_tile_layout_overlap_and_coverage():
    cfg = GundamTilingConfig(tile_px=1024, overlap_px=128, max_tiles=16)
    tiles = calculate_tiles(2000, 1500, cfg)
    assert len(tiles) <= 16
    # full coverage
    assert min(t[0] for t in tiles) == 0 and min(t[1] for t in tiles) == 0
    assert max(t[2] for t in tiles) == 2000 and max(t[3] for t in tiles) == 1500
    # overlap: consecutive x-starts closer than the tile size
    xs = sorted({t[0] for t in tiles})
    if len(xs) > 1:
        assert xs[1] - xs[0] < cfg.tile_px


def test_tile_cap_rescales_step():
    cfg = GundamTilingConfig(tile_px=1024, overlap_px=128, max_tiles=4)
    tiles = calculate_tiles(5000, 5000, cfg)
    assert len(tiles) <= 4
    assert max(t[2] for t in tiles) == 5000  # still covers the right edge


# ---------------------------------------------------------------------------
# confidence + ladder
# ---------------------------------------------------------------------------


def test_confidence_heuristic():
    good = estimate_confidence("The quarterly payment schedule requires settlement in thirty days.")
    garbage = estimate_confidence("@@## $$ %% ^^ && 11 22 !!")
    repeated = estimate_confidence("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")
    assert good > 0.7
    assert garbage < good
    assert repeated < good
    assert estimate_confidence("") == 0.0


def test_mode_ladder():
    assert next_mode("tiny") == "small"
    assert next_mode("base") == "large"
    assert next_mode("large") == "gundam"
    assert next_mode("gundam") is None


def test_processor_escalates_on_low_confidence():
    calls = []

    def ocr_fn(img, mode):
        calls.append(mode)
        return ("@@##", 0.1) if mode == "base" else ("The clear extracted text.", 0.9)

    proc = OCRProcessor(ocr_fn, OCRConfig(initial_mode="base", retry_limit=2))
    res = proc.process_image(make_png(100, 100))
    assert calls == ["base", "large"]
    assert res.mode == "large"
    assert res.confidence == 0.9


def test_processor_keeps_best_after_exhaustion():
    def ocr_fn(img, mode):
        return {"base": ("meh", 0.3), "large": ("better", 0.5), "gundam": ("worse", 0.2)}[mode]

    proc = OCRProcessor(ocr_fn, OCRConfig(initial_mode="base", retry_limit=2, confidence_threshold=0.9))
    res = proc.process_image(make_png(100, 100))
    assert res.text == "better"
    assert res.metadata.get("escalated")


def test_processor_survives_ocr_errors():
    def ocr_fn(img, mode):
        if mode == "base":
            raise RuntimeError("server down")
        return ("recovered text here", 0.8)

    proc = OCRProcessor(ocr_fn, OCRConfig(initial_mode="base"))
    res = proc.process_image(make_png(100, 100))
    assert res.text == "recovered text here"


# ---------------------------------------------------------------------------
# gundam pipeline + merges
# ---------------------------------------------------------------------------


def test_gundam_tiling_pipeline_with_stub_crop():
    seen_boxes = []

    def crop_fn(img, box):
        seen_boxes.append(box)
        return f"tile:{box}".encode()

    def ocr_fn(img, mode):
        assert mode == "gundam"
        return (f"line from {img.decode()}", 0.8)

    cfg = OCRConfig(tiling=GundamTilingConfig(trigger_px=1500, tile_px=1024, overlap_px=128,
                                              merge_strategy="concat"))
    proc = OCRProcessor(ocr_fn, cfg, crop_fn=crop_fn)
    res = proc.process_image(make_png(2048, 1600))
    assert res.mode == "gundam"
    assert res.tiles_used == len(seen_boxes) > 1
    assert res.text.count("line from") == res.tiles_used


def test_merge_concat():
    assert merge_concat(["a", "", "b"]) == "a\nb"


def test_merge_fuzzy_dedups_near_duplicates():
    cfg = GundamTilingConfig(fuzzy_threshold=0.85)
    merged = merge_fuzzy(
        ["The payment schedule is quarterly.\nAlpha content about invoices.",
         "The payment schedule is quarterly!\nCompletely different words here."],
        cfg,
    )
    assert merged.count("payment schedule") == 1  # seam duplicate dropped
    assert "Alpha content" in merged and "Completely different" in merged


def test_merge_vote_keeps_highest_confidence():
    cfg = GundamTilingConfig(fuzzy_threshold=0.85)
    merged = merge_vote(
        [("The payment schedule is qvarterly.", 0.4),
         ("The payment schedule is quarterly.", 0.9)],
        cfg,
    )
    assert "quarterly" in merged
    assert "qvarterly" not in merged
