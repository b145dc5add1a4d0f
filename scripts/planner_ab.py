"""LLM-planner A/B: does planning quality change retrieval outcomes? (round-5 task #5)

Round 4 proved the HTTP planner adapter is lossless (llm_adapter_roundtrip.json)
but the thing on both ends was the rule planner. This harness puts a TRAINED
language model in the planner seat and measures the retrieval delta:

1. Builds the 240-module code-graph corpus with the self-extracted graph
   (the corpus whose routing decisions actually matter — graph queries are
   lexically invisible).
2. Generates (query -> plan) supervision from the shipped rule planner over
   synthetic relational/procedural/comparative templates + corpus cloze
   sentences, serialized EXACTLY as the constrained-decoding template walks.
3. Trains a byte-level causal LM (GPT-2 architecture, 256-byte vocab — the
   in-image stand-in for the reference's GPT-5 planner,
   rag2/query_planner.py:97-190) on those pairs.
4. Plans every eval query three ways — shipped rule planner, the trained LM
   through ``constrained_generate`` + ``CallablePlanner`` (a slice of it
   through the REAL HTTP adapter rung: stdlib server -> HTTPPlannerClient),
   and a no-routing floor (requires_graph always false) — and runs the full
   funnel under each. recall@10 per query kind + plan agreement rates.

Honesty note: train and eval queries come from overlapping template families
(hermetic environment — no external LLM exists to generalize from); the
measurement is (a) whether a trained model CAN reproduce routing well enough
to match the rule planner end-to-end, and (b) how much retrieval quality
depends on routing at all (the floor row).

Usage (real chip): python scripts/planner_ab.py [--modules 240] [--seed 7]
Writes eval_results/planner_ab.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def serialize_plan(intent: str, requires_graph: bool, op: str | None,
                   entity: str | None) -> str:
    """The exact byte string the constrained template emits for these choices."""
    s = '{"intent": "' + intent + '", "requires_graph": ' + (
        "true" if requires_graph else "false")
    if op is not None and entity is not None:
        s += ', "graph_query": {"op": "' + op + '", "entity": "' + entity + '"}'
    return s + "}"


PROMPT = "Plan the retrieval for this query.\nQuery: {q}\nPlan JSON: "
_INTENTS = ("factual", "procedural", "comparative", "entity_lookup", "relational")


def rule_plan_to_target(plan, candidates) -> str:
    intent = plan.intent if plan.intent in _INTENTS else "factual"
    ent = None
    for e in plan.graph_entities:
        if e in candidates:
            ent = e
            break
    if candidates:
        op = "neighborhood"
        return serialize_plan(intent, plan.requires_graph, op,
                              ent or candidates[0])
    return serialize_plan(intent, plan.requires_graph, None, None)


def make_training_pairs(rule_planner, docs, class_names, rng, n_cloze=600):
    """(prompt, target) pairs: relational templates over real class names +
    cloze sentences from the corpus docs, all labeled by the rule planner."""
    pairs = []
    rel_templates = [
        "The class {c} belongs to which module?",
        "which module defines {c}?",
        "what does {c} depend on?",
        "which classes are related to {c}?",
        "how do I use the class {c}?",
        "compare {c} and {c2}",
    ]
    names = list(class_names)
    rng.shuffle(names)
    for i, c in enumerate(names[:400]):
        t = rel_templates[i % len(rel_templates)]
        c2 = names[(i + 1) % len(names)]
        q = t.format(c=c, c2=c2)
        cands = candidate_entities(q, set(class_names))
        pairs.append((q, rule_plan_to_target(rule_planner.plan(q), cands), cands))
    texts = [t for _, t in docs]
    for _ in range(n_cloze):
        text = texts[rng.integers(0, len(texts))]
        sents = [s.strip() for s in text.replace("\n", " ").split(". ")
                 if len(s.split()) >= 6]
        if not sents:
            continue
        q = sents[rng.integers(0, len(sents))][:200]
        cands = candidate_entities(q, set(class_names))
        pairs.append((q, rule_plan_to_target(rule_planner.plan(q), cands), cands))
    return pairs


def candidate_entities(query: str, known: set, cap: int = 16):
    """Entity candidates for the plan template: known entity names appearing in
    the query text (the production candidate-generation step; the reference
    planner likewise only names entities it sees in the query)."""
    out = [n for n in known if n in query]
    out.sort(key=lambda n: (-len(n), n))
    return out[:cap]


def train_lm(pairs, epochs=4, lr=3e-4, seed=0, log=print):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(seed)
    model = GPT2LMHeadModel(GPT2Config(
        vocab_size=256, n_positions=512, n_embd=192, n_layer=4, n_head=6,
    ))
    opt = torch.optim.AdamW(model.parameters(), lr=lr)
    data = []
    for q, target, _ in pairs:
        ids = list((PROMPT.format(q=q) + target).encode("utf-8", "replace"))[:510]
        plen = len(PROMPT.format(q=q).encode("utf-8", "replace"))
        data.append((ids, min(plen, len(ids))))
    model.train()
    rng = np.random.default_rng(seed)
    order = np.arange(len(data))
    for ep in range(epochs):
        rng.shuffle(order)
        tot, nb = 0.0, 0
        for lo in range(0, len(order), 8):
            batch = [data[i] for i in order[lo : lo + 8]]
            maxlen = max(len(ids) for ids, _ in batch)
            x = torch.zeros((len(batch), maxlen), dtype=torch.long)
            labels = torch.full((len(batch), maxlen), -100, dtype=torch.long)
            for j, (ids, plen) in enumerate(batch):
                x[j, : len(ids)] = torch.tensor(ids)
                # loss only on the plan bytes — the model learns to PLAN,
                # not to model query text
                labels[j, plen : len(ids)] = torch.tensor(ids[plen:])
            out = model(x, labels=labels)
            opt.zero_grad()
            out.loss.backward()
            opt.step()
            tot += float(out.loss)
            nb += 1
        log(f"  epoch {ep}: loss {tot / nb:.4f}")
    model.eval()
    return model


def lm_logprobs_fn(model):
    import torch

    cache = {}

    def fn(ids):
        key = bytes(ids[-511:])
        if key in cache:
            return cache[key]
        t = torch.tensor([list(ids)[-511:] or [0]])
        with torch.no_grad():
            logits = model(t).logits[0, -1]
        out = torch.log_softmax(logits, -1).numpy()
        if len(cache) < 200000:
            cache[key] = out
        return out

    return fn


def make_llm_planner_fn(model, known_entities):
    from triple_hybrid_rag_tpu.models.constrained import (
        make_constrained_planner_fn,
    )

    logprobs = lm_logprobs_fn(model)
    known = set(known_entities)

    def fn(query: str) -> dict:
        cands = candidate_entities(query, known)
        return make_constrained_planner_fn(logprobs, cands)(query)

    return fn


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modules", type=int, default=240)
    ap.add_argument("--graph-queries", type=int, default=120)
    ap.add_argument("--cloze-queries", type=int, default=120)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--http-slice", type=int, default=24)
    ap.add_argument("--out", default="eval_results/planner_ab.json")
    args = ap.parse_args()

    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import evaluate, make_code_graph_eval
    from triple_hybrid_rag_tpu.index.graph_index import build_graph_index
    from triple_hybrid_rag_tpu.models.planner import (
        CallablePlanner,
        RuleBasedPlanner,
    )
    from triple_hybrid_rag_tpu.retrieval import Retriever

    base = RAGConfig(
        capacity_round=64, embedding_dtype="float32", safety_threshold=0.0,
        final_top_k=10, rerank_top_k=20, denoise_alpha=0.0, graph_enabled=True,
    )
    t0 = time.time()
    data = make_code_graph_eval(
        base, n_modules=args.modules, n_graph_queries=args.graph_queries,
        n_cloze_queries=args.cloze_queries, seed=args.seed,
        graph_source="extracted", include_api_docs=True,
    )
    ents = [e.canonical_name for e in data.entity_store.entities.values()]
    print(f"corpus: {data.corpus.n_parents} parents, {len(ents)} entities "
          f"({time.time()-t0:.0f}s)", flush=True)

    rule = RuleBasedPlanner(base)
    rng = np.random.default_rng(args.seed)
    pairs = make_training_pairs(rule, data.docs, ents, rng)
    print(f"training pairs: {len(pairs)}", flush=True)
    t0 = time.time()
    model = train_lm(pairs, epochs=args.epochs, seed=args.seed,
                     log=lambda m: print(m, flush=True))
    print(f"trained in {time.time()-t0:.0f}s", flush=True)

    llm_fn = make_llm_planner_fn(model, ents)

    # plan agreement on the eval queries
    agree = {"intent": 0, "requires_graph": 0, "entity_seed": 0, "n": 0}
    t0 = time.time()
    for q in data.queries:
        rp = rule.plan(q.text)
        lp = CallablePlanner(llm_fn, base).plan(q.text)
        agree["n"] += 1
        agree["requires_graph"] += int(rp.requires_graph == lp.requires_graph)
        agree["intent"] += int(rp.intent == lp.intent)
        rset = set(rp.graph_entities)
        lset = set(lp.graph_entities)
        agree["entity_seed"] += int(
            bool(rset & lset) or (not rset and not lset))
    plan_s = (time.time() - t0) / max(agree["n"], 1)
    print(f"agreement: {agree} ({plan_s*1e3:.0f} ms/plan)", flush=True)

    gidx = build_graph_index(data.entity_store, data.corpus, base)
    k = 10
    results = {}
    planners = {
        "rule": None,  # shipped default
        "llm_constrained": CallablePlanner(llm_fn, base),
        "never_graph_floor": CallablePlanner(
            lambda q: {"intent": "factual", "requires_graph": False,
                       "graph_entities": []}, base),
    }
    for name, planner in planners.items():
        t0 = time.time()
        retr = Retriever(data.corpus, base, graph_index=gidx)
        if planner is not None:
            retr.planner = planner
        res = evaluate(lambda q: retr.retrieve(q, top_k=k), data.queries, k=k)
        res["elapsed_s"] = round(time.time() - t0, 1)
        results[name] = res
        print(f"{name}: recall@{k}={res[f'recall@{k}']:.4f} "
              f"graph={res.get(f'recall@{k}_graph', float('nan')):.4f} "
              f"cloze={res.get(f'recall@{k}_cloze', float('nan')):.4f}", flush=True)

    # HTTP adapter rung on a slice: the SAME trained model served behind the
    # stdlib server, driven through HTTPPlannerClient (reference wire shape)
    http_row = None
    try:
        from scripts.llm_adapter_roundtrip import start_server

        from triple_hybrid_rag_tpu.models.http_clients import HTTPPlannerClient

        class _FnPlanner:  # planner-protocol shim over the raw fn
            def plan(self, q, collection=None):
                return CallablePlanner(llm_fn, base).plan(q, collection)

        srv, port = start_server(_FnPlanner(), None, None, False)
        try:
            http_planner = HTTPPlannerClient(
                api_base=f"http://127.0.0.1:{port}/v1", config=base)
            retr = Retriever(data.corpus, base, graph_index=gidx)
            retr.planner = http_planner
            sl = data.queries[: args.http_slice]
            res = evaluate(lambda q: retr.retrieve(q, top_k=k), sl, k=k)
            # same slice under the in-process planner for a like-for-like delta
            retr2 = Retriever(data.corpus, base, graph_index=gidx)
            retr2.planner = CallablePlanner(llm_fn, base)
            res_local = evaluate(lambda q: retr2.retrieve(q, top_k=k), sl, k=k)
            http_row = {
                "n": len(sl),
                f"recall@{k}_http": res[f"recall@{k}"],
                f"recall@{k}_local": res_local[f"recall@{k}"],
                "identical": res[f"recall@{k}"] == res_local[f"recall@{k}"],
            }
            print(f"http rung: {http_row}", flush=True)
        finally:
            srv.shutdown()
    except Exception as e:  # the A/B result stands without the HTTP rung
        http_row = {"error": repr(e)}
        print(f"http rung failed: {e!r}", flush=True)

    payload = {
        "modules": args.modules, "seed": args.seed,
        "n_queries": agree["n"],
        "training_pairs": len(pairs), "epochs": args.epochs,
        "lm": "GPT-2 arch, byte vocab 256, n_embd 192, n_layer 4 (trained here)",
        "plan_agreement": agree,
        "ms_per_plan_llm": round(plan_s * 1e3, 1),
        "results": results,
        "http_rung": http_row,
        "note": "train/eval template families overlap (hermetic); measures "
                "whether a trained LM reproduces routing end-to-end and how "
                "much quality depends on routing (floor row)",
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(f"-> {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
