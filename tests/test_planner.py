"""Query planner tests (reference _simple_plan heuristics parity)."""

from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.models.planner import CallablePlanner, RuleBasedPlanner, get_planner


def _planner(**kw):
    return RuleBasedPlanner(RAGConfig(**kw))


def test_keywords_extracted():
    plan = _planner().plan("What are the payment terms in the contract?")
    assert "payment" in plan.keywords and "term" in plan.keywords
    assert "the" not in plan.keywords
    assert plan.semantic_query_text  # never empty


def test_intent_factual():
    assert _planner().plan("What is the termination clause?").intent == "factual"


def test_intent_procedural_boosts_lexical():
    cfg = RAGConfig()
    plan = RuleBasedPlanner(cfg).plan("How do I reset my password?")
    assert plan.intent == "procedural"
    assert plan.weights["lexical"] > cfg.lexical_weight


def test_intent_comparative():
    assert _planner().plan("difference between plan A and plan B").intent == "comparative"


def test_intent_entity_lookup_requires_graph():
    plan = _planner().plan("Who is John Smith?")
    assert plan.intent == "entity_lookup"
    assert plan.requires_graph
    assert "John Smith" in plan.graph_entities


def test_graph_triggers():
    plan = _planner().plan("relationship between Acme Corp and Beta Logistics")
    assert plan.requires_graph
    assert plan.intent in ("relational", "comparative")
    assert "Acme Corp" in plan.graph_entities


def test_no_graph_halves_weight():
    cfg = RAGConfig()
    plan = RuleBasedPlanner(cfg).plan("explain invoice processing steps")
    assert not plan.requires_graph
    assert plan.weights["graph"] == 0.5


def test_graph_disabled_config():
    plan = _planner(graph_enabled=False).plan("Who is John Smith?")
    assert not plan.requires_graph


def test_relational_intent_scales_text_channels():
    cfg = RAGConfig()
    plan = RuleBasedPlanner(cfg).plan("The class ShutilError belongs to which module?")
    assert plan.intent in ("relational", "entity_lookup")
    assert plan.requires_graph
    assert plan.weights["lexical"] == cfg.lexical_weight * cfg.planner_relational_text_scale
    assert plan.weights["semantic"] == cfg.semantic_weight * cfg.planner_relational_text_scale
    assert plan.weights["graph"] == cfg.graph_weight  # graph keeps full weight


def test_relational_scale_disabled_at_one():
    cfg = RAGConfig(planner_relational_text_scale=1.0)
    plan = RuleBasedPlanner(cfg).plan("The class ShutilError belongs to which module?")
    assert plan.weights["lexical"] == cfg.lexical_weight
    assert plan.weights["semantic"] == cfg.semantic_weight


def test_portuguese_triggers():
    plan = _planner().plan("Quem trabalha para Acme Corp?")
    assert plan.requires_graph


def test_callable_planner_overrides_and_falls_back():
    cfg = RAGConfig(planner_backend="llm")

    def good(q):
        return {"keywords": ["x"], "intent": "factual", "requires_graph": False}

    def bad(q):
        raise RuntimeError("llm down")

    p = get_planner(cfg, llm_fn=good)
    assert isinstance(p, CallablePlanner)
    assert p.plan("anything").keywords == ["x"]

    p2 = CallablePlanner(bad, cfg)
    plan = p2.plan("What are the payment terms?")
    assert "payment" in plan.keywords  # rule fallback engaged
