"""Fusion op tests vs a pure-Python RRF oracle (reference semantics:
rag2/retrieval.py:358-376, core/fusion.py:52-247)."""

import numpy as np
import jax.numpy as jnp
import pytest

from triple_hybrid_rag_tpu.ops.fusion import (
    GRAPH_BIT,
    LEXICAL_BIT,
    SEMANTIC_BIT,
    apply_safety_denoise,
    conformal_denoise_mask,
    fuse_rrf,
    minmax_normalize,
)


def pad_ids(ids, k):
    out = np.full((k,), -1, dtype=np.int32)
    out[: len(ids)] = ids
    return jnp.asarray(out)


def pad_scores(scores, k):
    out = np.zeros((k,), dtype=np.float32)
    out[: len(scores)] = scores
    return jnp.asarray(out)


def python_rrf_oracle(channels, weights, k=60):
    """channels: dict name -> ranked id list. Returns dict id -> fused score."""
    fused = {}
    for (name, ids), w in zip(channels.items(), weights):
        for rank, cid in enumerate(ids, start=1):
            fused[cid] = fused.get(cid, 0.0) + w / (k + rank)
    return fused


def test_fuse_matches_python_oracle():
    lex = [3, 1, 4]
    sem = [1, 5, 9, 2]
    gr = [5, 3]
    weights = (0.7, 0.8, 1.0)
    oracle = python_rrf_oracle({"l": lex, "s": sem, "g": gr}, weights)

    out = fuse_rrf(
        pad_ids(lex, 8), pad_scores([3.0, 2.0, 1.0], 8),
        pad_ids(sem, 8), pad_scores([0.9, 0.8, 0.7, 0.6], 8),
        pad_ids(gr, 8), pad_scores([1.0, 0.5], 8),
        jnp.asarray(weights, jnp.float32),
        rrf_k=60, top_k=10,
    )
    ids = np.asarray(out.ids)
    rrf = np.asarray(out.rrf)
    got = {int(i): float(s) for i, s in zip(ids, rrf) if i >= 0}
    assert set(got) == set(oracle)
    for cid, score in oracle.items():
        assert got[cid] == pytest.approx(score, rel=1e-5)
    # sorted descending
    valid_rrf = rrf[ids >= 0]
    assert np.all(np.diff(valid_rrf) <= 1e-7)
    # multi-channel candidates outrank single-channel ones with worse ranks
    assert ids[0] in (1, 5, 3)


def test_channel_bitmask_and_raw_scores():
    out = fuse_rrf(
        pad_ids([7], 4), pad_scores([2.5], 4),
        pad_ids([7, 8], 4), pad_scores([0.9, 0.3], 4),
        pad_ids([8], 4), pad_scores([0.6], 4),
        jnp.asarray([0.7, 0.8, 1.0], jnp.float32),
        top_k=4,
    )
    ids = np.asarray(out.ids)
    by_id = {int(i): j for j, i in enumerate(ids) if i >= 0}
    assert np.asarray(out.channels)[by_id[7]] == LEXICAL_BIT | SEMANTIC_BIT
    assert np.asarray(out.channels)[by_id[8]] == SEMANTIC_BIT | GRAPH_BIT
    assert np.asarray(out.lexical)[by_id[7]] == pytest.approx(2.5)
    assert np.asarray(out.semantic)[by_id[7]] == pytest.approx(0.9)
    assert np.asarray(out.graph)[by_id[8]] == pytest.approx(0.6)
    assert np.asarray(out.lexical)[by_id[8]] == 0.0


def test_dedup_single_output_per_id():
    out = fuse_rrf(
        pad_ids([1, 2], 4), pad_scores([2, 1], 4),
        pad_ids([1, 2], 4), pad_scores([0.9, 0.8], 4),
        pad_ids([1, 2], 4), pad_scores([0.7, 0.6], 4),
        jnp.asarray([1.0, 1.0, 1.0], jnp.float32),
        top_k=12,
    )
    ids = np.asarray(out.ids)
    vals = ids[ids >= 0]
    assert sorted(vals.tolist()) == [1, 2]


def test_empty_channels():
    out = fuse_rrf(
        pad_ids([], 4), pad_scores([], 4),
        pad_ids([], 4), pad_scores([], 4),
        pad_ids([], 4), pad_scores([], 4),
        jnp.asarray([0.7, 0.8, 1.0], jnp.float32),
        top_k=4,
    )
    assert np.all(np.asarray(out.ids) == -1)
    assert np.all(np.asarray(out.rrf) == 0.0)


def test_weights_zero_channel_disabled():
    """weight 0 removes a channel's influence (reference: plan weights may zero graph)."""
    out = fuse_rrf(
        pad_ids([1], 4), pad_scores([1.0], 4),
        pad_ids([2], 4), pad_scores([0.9], 4),
        pad_ids([3], 4), pad_scores([0.8], 4),
        jnp.asarray([1.0, 1.0, 0.0], jnp.float32),
        top_k=4,
    )
    ids, rrf = np.asarray(out.ids), np.asarray(out.rrf)
    by_id = {int(i): float(r) for i, r in zip(ids, rrf) if i >= 0}
    assert by_id[3] == 0.0  # still a candidate, but zero fused score


# ---------------------------------------------------------------------------
# safety / denoise (reference rag2/retrieval.py:461-495)
# ---------------------------------------------------------------------------


def test_safety_refuses_below_threshold():
    r = apply_safety_denoise(
        pad_ids([1, 2], 8), pad_scores([0.5, 0.4], 8),
        jnp.float32(0.6), jnp.float32(0.6), top_k=4,
    )
    assert bool(r.refused)
    assert float(r.max_score) == pytest.approx(0.5)
    assert np.all(np.asarray(r.ids) == -1)


def test_safety_passes_and_denoises():
    r = apply_safety_denoise(
        pad_ids([1, 2, 3, 4], 8), pad_scores([0.9, 0.8, 0.5, 0.2], 8),
        jnp.float32(0.6), jnp.float32(0.6), top_k=4,
    )
    assert not bool(r.refused)
    ids = np.asarray(r.ids)
    # alpha*max = 0.54 -> keep 0.9, 0.8; drop 0.5, 0.2
    assert ids[0] == 1 and ids[1] == 2
    assert np.all(ids[2:] == -1)


def test_safety_empty_input_refuses():
    r = apply_safety_denoise(
        pad_ids([], 4), pad_scores([], 4), jnp.float32(0.6), jnp.float32(0.6), top_k=4
    )
    assert bool(r.refused)
    assert float(r.max_score) == 0.0


def test_safety_top_k_truncation():
    r = apply_safety_denoise(
        pad_ids([1, 2, 3], 8), pad_scores([0.9, 0.89, 0.88], 8),
        jnp.float32(0.6), jnp.float32(0.5), top_k=2,
    )
    ids = np.asarray(r.ids)
    assert (ids >= 0).sum() == 2 and ids[0] == 1


# ---------------------------------------------------------------------------
# conformal denoising (lib variant, core/fusion.py:218-247)
# ---------------------------------------------------------------------------


def test_conformal_matches_numpy_percentile():
    scores = [0.9, 0.7, 0.5, 0.3, 0.1]
    alpha = 0.6
    thresh = np.percentile(scores, (1 - alpha) * 100)
    keep = conformal_denoise_mask(
        pad_ids([1, 2, 3, 4, 5], 8), pad_scores(scores, 8), jnp.float32(alpha)
    )
    keep = np.asarray(keep)
    expected = np.array([s >= thresh for s in scores])
    np.testing.assert_array_equal(keep[:5], expected)
    assert not keep[5:].any()


def test_conformal_skips_below_three():
    keep = conformal_denoise_mask(
        pad_ids([1, 2], 8), pad_scores([0.9, 0.1], 8), jnp.float32(0.6)
    )
    keep = np.asarray(keep)
    assert keep[:2].all()  # identity when < 3 results


def test_minmax_normalize():
    ids = pad_ids([1, 2, 3], 8)
    out = np.asarray(minmax_normalize(ids, pad_scores([2.0, 1.0, 0.5], 8)))
    assert out[0] == pytest.approx(1.0)
    assert out[2] == pytest.approx(0.0)
    assert 0.0 < out[1] < 1.0
    # all-equal -> 1.0
    out2 = np.asarray(minmax_normalize(ids, pad_scores([0.4, 0.4, 0.4], 8)))
    np.testing.assert_allclose(out2[:3], 1.0)


def test_gate_scores_split_order_vs_refusal():
    """apply_safety_denoise: ordering follows `scores`, refusal/max/keep follow
    `gate_scores` (the rerank_blend_rrf contract — see ops/fusion.py)."""
    import jax.numpy as jnp

    from triple_hybrid_rag_tpu.ops.fusion import apply_safety_denoise

    ids = jnp.asarray([10, 11, 12, -1])
    order = jnp.asarray([0.9, 0.95, 0.1, 0.0])   # blended: 11 above 10
    gate = jnp.asarray([0.8, 0.7, 0.05, 0.0])    # pure rerank
    r = apply_safety_denoise(
        ids, order, jnp.float32(0.6), jnp.float32(0.0), top_k=3, gate_scores=gate
    )
    assert not bool(r.refused)
    assert float(r.max_score) == pytest.approx(0.8)  # max of GATE, not order
    assert list(np.asarray(r.ids)[:2]) == [11, 10]   # ordered by ORDER scores

    # refusal driven by gate even when ordering scores are high
    low_gate = jnp.asarray([0.3, 0.2, 0.05, 0.0])
    r2 = apply_safety_denoise(
        ids, order, jnp.float32(0.6), jnp.float32(0.0), top_k=3, gate_scores=low_gate
    )
    assert bool(r2.refused)

    # alpha-max keep mask uses gate scores: candidate 12 (gate 0.05 < 0.5*0.8)
    # is dropped even though its ordering score alone would survive
    r3 = apply_safety_denoise(
        ids, order, jnp.float32(0.0), jnp.float32(0.5), top_k=3, gate_scores=gate
    )
    assert 12 not in list(np.asarray(r3.ids))


def test_calibrate_maxsim_monotone_and_clipped():
    import jax.numpy as jnp

    from triple_hybrid_rag_tpu.ops.maxsim import calibrate_maxsim

    s = jnp.asarray([0.0, 0.3, 0.6, 0.9])
    out = np.asarray(calibrate_maxsim(s, 0.6))
    np.testing.assert_allclose(out, [0.0, 0.5, 1.0, 1.0], atol=1e-6)
    # calibration >= 1 is the identity (no anchors)
    np.testing.assert_allclose(np.asarray(calibrate_maxsim(s, 1.0)), np.asarray(s))


def test_fuse_rrf_pool_smaller_than_top_k():
    """A candidate pool smaller than top_k pads with invalid slots instead of
    crashing (rare-token query through a single channel)."""
    import jax.numpy as jnp

    from triple_hybrid_rag_tpu.ops.fusion import fuse_rrf

    lex = jnp.asarray([5], jnp.int32)
    empty = jnp.asarray([-1], jnp.int32)
    zeros = jnp.zeros((1,), jnp.float32)
    out = fuse_rrf(
        lex, jnp.asarray([2.0]), empty, zeros, empty, zeros,
        weights=jnp.asarray([1.0, 1.0, 1.0]), top_k=20,
    )
    assert out.ids.shape == (20,)
    assert int(out.ids[0]) == 5 and float(out.rrf[0]) > 0
    assert np.all(np.asarray(out.ids[1:]) == -1)
    assert np.all(np.asarray(out.rrf[1:]) == 0.0)


def python_combsum_oracle(channels, weights):
    """channels: dict name -> (ids, scores). CombSUM over per-channel min-max."""
    fused = {}
    for (name, (ids, scores)), w in zip(channels.items(), weights):
        if not ids:
            continue
        lo, hi = min(scores), max(scores)
        for cid, sc in zip(ids, scores):
            norm = (sc - lo) / (hi - lo) if hi > lo else 1.0
            fused[cid] = fused.get(cid, 0.0) + w * norm
    return fused


def test_score_blend_zero_is_exact_rank_rrf():
    lex, lex_s = [3, 1, 4], [3.0, 2.0, 1.0]
    sem, sem_s = [1, 5, 9, 2], [0.9, 0.8, 0.7, 0.6]
    w = jnp.asarray([0.7, 0.8, 1.0], jnp.float32)
    args = (
        pad_ids(lex, 8), pad_scores(lex_s, 8),
        pad_ids(sem, 8), pad_scores(sem_s, 8),
        pad_ids([], 8), pad_scores([], 8), w,
    )
    a = fuse_rrf(*args, rrf_k=60, top_k=10)
    b = fuse_rrf(*args, rrf_k=60, top_k=10, score_blend=0.0)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_allclose(np.asarray(a.rrf), np.asarray(b.rrf))


def test_score_blend_one_matches_combsum_oracle():
    lex, lex_s = [3, 1, 4], [3.0, 2.0, 1.0]
    sem, sem_s = [1, 5, 9, 2], [0.9, 0.8, 0.7, 0.6]
    gr, gr_s = [5, 3], [1.0, 0.5]
    weights = (0.7, 0.8, 1.0)
    oracle = python_combsum_oracle(
        {"l": (lex, lex_s), "s": (sem, sem_s), "g": (gr, gr_s)}, weights
    )
    o_max = max(oracle.values())
    out = fuse_rrf(
        pad_ids(lex, 8), pad_scores(lex_s, 8),
        pad_ids(sem, 8), pad_scores(sem_s, 8),
        pad_ids(gr, 8), pad_scores(gr_s, 8),
        jnp.asarray(weights, jnp.float32),
        rrf_k=60, top_k=10, score_blend=1.0,
    )
    ids = np.asarray(out.ids)
    key = np.asarray(out.rrf)
    got = {int(i): float(s) for i, s in zip(ids, key) if i >= 0}
    assert set(got) == set(oracle)
    for cid, score in oracle.items():
        # fuse_rrf max-normalizes the blended key over the pool
        assert got[cid] == pytest.approx(score / o_max, rel=1e-5)
    valid = key[ids >= 0]
    assert np.all(np.diff(valid) <= 1e-7)


def test_score_blend_uses_score_gaps_ranks_cannot_see():
    """Two rank-2 hits are identical to rank-RRF; CombSUM separates them by how
    far each sits from its own list's leader — the information rank fusion
    discards (the mechanism behind the 0.525 -> 0.560 lab result)."""
    # lexical: doc 2 is a close runner-up (8 vs 10); semantic: doc 8 is far
    # behind its leader (0.35 vs 0.9 over a 0.6 span)
    lex, lex_s = [1, 2, 3], [10.0, 8.0, 1.0]
    sem, sem_s = [7, 8, 9], [0.9, 0.35, 0.3]
    w = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)
    args = (
        pad_ids(lex, 8), pad_scores(lex_s, 8),
        pad_ids(sem, 8), pad_scores(sem_s, 8),
        pad_ids([], 8), pad_scores([], 8), w,
    )
    rrf_out = fuse_rrf(*args, rrf_k=60, top_k=6)
    comb_out = fuse_rrf(*args, rrf_k=60, top_k=6, score_blend=1.0)
    rrf_ids, rrf_key = np.asarray(rrf_out.ids), np.asarray(rrf_out.rrf)
    comb_ids, comb_key = np.asarray(comb_out.ids), np.asarray(comb_out.rrf)
    # rank-RRF: both rank-2 docs score identically
    assert float(rrf_key[list(rrf_ids).index(2)]) == pytest.approx(
        float(rrf_key[list(rrf_ids).index(8)]), rel=1e-6
    )
    # CombSUM: doc 2 (norm 7/9) well above doc 8 (norm 0.05/0.6)
    d2 = float(comb_key[list(comb_ids).index(2)])
    d8 = float(comb_key[list(comb_ids).index(8)])
    assert d2 > d8 + 0.5


def test_lex_conf_gate_silences_dense_on_decisive_lexical():
    """Decisive lexical margin -> semantic weight gated to ~0; flat lexical
    margin -> semantic keeps full voice (the paraphrase case)."""
    sem, sem_s = [7, 8], [0.9, 0.2]
    w = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)

    def run(lex_s, gate):
        return fuse_rrf(
            pad_ids([1, 2], 8), pad_scores(lex_s, 8),
            pad_ids(sem, 8), pad_scores(sem_s, 8),
            pad_ids([], 8), pad_scores([], 8), w,
            rrf_k=60, top_k=4, score_blend=1.0, lex_conf_gate=4.0 if gate else 0.0,
        )

    # decisive lexical (margin 0.8 -> g = 1 - min(1, 4*0.8) = 0): doc 7 (sem
    # leader) must fall below doc 2 (lexical runner-up) once gated
    decisive = run([10.0, 2.0], gate=True)
    ids = list(np.asarray(decisive.ids))
    assert ids.index(2) < ids.index(7)
    ungated = run([10.0, 2.0], gate=False)
    ids_u = list(np.asarray(ungated.ids))
    assert ids_u.index(7) < ids_u.index(2)  # sem leader outranks lex runner-up

    # flat lexical (margin 0.01 -> g ~ 0.96): ordering matches ungated
    flat_g = run([10.0, 9.9], gate=True)
    flat_u = run([10.0, 9.9], gate=False)
    assert list(np.asarray(flat_g.ids)) == list(np.asarray(flat_u.ids))


def test_lex_conf_gate_noop_when_lexical_sparse():
    """Fewer than two lexical hits -> margin undefined -> no gating."""
    w = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)
    for lex, lex_s in (([], []), ([1], [5.0])):
        a = fuse_rrf(
            pad_ids(lex, 8), pad_scores(lex_s, 8),
            pad_ids([7, 8], 8), pad_scores([0.9, 0.2], 8),
            pad_ids([], 8), pad_scores([], 8), w,
            rrf_k=60, top_k=4, score_blend=1.0, lex_conf_gate=8.0,
        )
        b = fuse_rrf(
            pad_ids(lex, 8), pad_scores(lex_s, 8),
            pad_ids([7, 8], 8), pad_scores([0.9, 0.2], 8),
            pad_ids([], 8), pad_scores([], 8), w,
            rrf_k=60, top_k=4, score_blend=1.0,
        )
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
        np.testing.assert_allclose(np.asarray(a.rrf), np.asarray(b.rrf), rtol=1e-6)
