"""Cypher → structured-op translation shim tests.

The reference planner emits raw Cypher (query_planner.py:78) executed by
PuppyGraph (puppygraph.py:400); the shim lowers the reference's own query
shapes (puppygraph.py:153-370) onto GraphIndex.execute_query. Translation is
tested pure, then the end-to-end path against the entity fixture graph."""

import pytest

from triple_hybrid_rag_tpu.index.cypher import (
    CypherTranslationError,
    translate_cypher,
    tokenize_cypher,
)
from triple_hybrid_rag_tpu.index.graph_index import build_graph_index

from test_graph import build_graph_fixture, gcfg  # noqa: F401  (fixture)


# ---------------------------------------------------------------------------
# pure translation
# ---------------------------------------------------------------------------


def test_tokenizer_strings_params_arrows():
    toks = tokenize_cypher("MATCH (e {name: 'O\\'Brien'})-[*1..3]->(x) LIMIT $n")
    vals = [v for _, v in toks]
    assert "O'Brien" in vals and "->" in vals and "$n" in vals and ".." in vals


def test_neighborhood_variable_hops():
    # the reference's expansion shape: entity match + variable-hop + chunks
    # (puppygraph.py:153-160)
    op = translate_cypher(
        "MATCH (e:Entity {name: 'Acme Corp'})-[*1..3]-(related) "
        "MATCH (related)-[:MENTIONED_IN]->(c:Chunk) RETURN c LIMIT 25"
    )
    assert op == {"op": "neighborhood", "entity": "Acme Corp", "hops": 3, "limit": 25}


def test_single_hop_is_related():
    op = translate_cypher("MATCH (e:Entity {name: 'Acme Corp'})-[r]-(b) RETURN b")
    assert op == {"op": "related", "entity": "Acme Corp"}


def test_bare_match_is_lookup():
    op = translate_cypher("MATCH (e:Entity {name: 'Acme Corp'}) RETURN e")
    assert op == {"op": "lookup", "entity": "Acme Corp"}


def test_where_contains_is_lookup():
    # name-search shape (puppygraph.py:204-211)
    op = translate_cypher(
        "MATCH (e:Entity) WHERE e.name CONTAINS 'acme' RETURN e LIMIT 5"
    )
    assert op["op"] == "lookup" and op["entity"] == "acme"


def test_where_in_is_keywords():
    op = translate_cypher(
        "MATCH (e:Entity) WHERE e.name IN ['acme', 'beta'] RETURN e LIMIT 7"
    )
    assert op == {"op": "keywords", "keywords": ["acme", "beta"], "limit": 7}


def test_shortest_path():
    op = translate_cypher(
        "MATCH p = shortestPath((a {name: 'John Smith'})-[*..4]-"
        "(b {name: 'CloudStack Systems'})) RETURN p"
    )
    assert op == {
        "op": "path", "from": "John Smith", "to": "CloudStack Systems",
        "max_hops": 4,
    }


def test_parameters_resolve():
    # the reference passes $tenant_id/$limit parameters (puppygraph.py:385)
    op = translate_cypher(
        "MATCH (e:Entity {name: $entity, tenant_id: $tenant_id})-[*1..2]-(r) "
        "RETURN r LIMIT $limit",
        {"entity": "Beta Logistics", "tenant_id": "t1", "limit": 10},
    )
    assert op == {
        "op": "neighborhood", "entity": "Beta Logistics", "hops": 2, "limit": 10,
    }


def test_directed_and_typed_relations_accepted():
    op = translate_cypher(
        "MATCH (e {name: 'X'})-[:WORKS_FOR|PARTNERS_WITH*2]->(o) RETURN o"
    )
    assert op == {"op": "neighborhood", "entity": "X", "hops": 2}


def test_unsupported_constructs_fail_loud():
    with pytest.raises(CypherTranslationError):
        translate_cypher("CREATE (n:Entity {name: 'x'})")
    with pytest.raises(CypherTranslationError):
        translate_cypher("MATCH (e) WHERE e.age > 3 RETURN e")
    with pytest.raises(CypherTranslationError):
        translate_cypher("MATCH (e) RETURN e")  # no seed entity derivable
    with pytest.raises(CypherTranslationError):
        translate_cypher("MATCH (e {name: $who}) RETURN e")  # unbound param


def test_unhonorable_inline_node_properties_fail_loud():
    """Inline node properties other than name aliases / tenant scoping must
    raise like the equivalent WHERE clause would, not be silently dropped."""
    with pytest.raises(CypherTranslationError):
        translate_cypher("MATCH (e {name: 'Acme', type: 'PERSON'}) RETURN e")
    # scoping props stay deliberate no-ops
    op = translate_cypher("MATCH (e {name: 'Acme', tenant_id: 't1'}) RETURN e")
    assert op is not None


def test_unhonorable_where_filters_fail_loud():
    """Property filters the device op cannot apply must raise, not silently
    return an unfiltered superset ('fail loud, not wrong' contract)."""
    # type filter on the seed: no predicate slot in the structured op
    with pytest.raises(CypherTranslationError):
        translate_cypher("MATCH (e {name: 'Acme'}) WHERE e.type = 'PERSON' RETURN e")
    # name filter on the OTHER variable while the seed is already named
    with pytest.raises(CypherTranslationError):
        translate_cypher(
            "MATCH (a {name: 'Acme'})-[r]-(b) WHERE b.name CONTAINS 'bank' RETURN b"
        )
    # tenant scoping clauses are deliberate no-ops (collection masks scope at
    # retrieval time), matching the tenant_id node-property treatment
    op = translate_cypher(
        "MATCH (e {name: 'Acme'})-[r]-(b) WHERE e.tenant_id = $t RETURN b",
        {"t": "org-1"},
    )
    assert op == {"op": "related", "entity": "Acme"}


# ---------------------------------------------------------------------------
# end-to-end on the device graph
# ---------------------------------------------------------------------------


def test_execute_cypher_neighborhood(gcfg):  # noqa: F811
    corpus, store = build_graph_fixture(gcfg)
    gidx = build_graph_index(store, corpus, gcfg)
    res = gidx.execute_cypher(
        "MATCH (e:Entity {name: 'John Smith'})-[*1..2]-(related) "
        "MATCH (related)-[:MENTIONED_IN]->(c:Chunk) RETURN c LIMIT 10"
    )
    assert res["op"] == "neighborhood" and res["chunk_rows"]
    texts = [corpus.child_by_row(int(i)).text for i in res["chunk_rows"]]
    assert any("John Smith" in t or "Acme Corp" in t for t in texts)
    # parity with the structured op it lowers to
    direct = gidx.execute_query(
        {"op": "neighborhood", "entity": "John Smith", "hops": 2, "limit": 10}
    )
    assert res["chunk_rows"] == direct["chunk_rows"]


def test_callable_planner_accepts_cypher_query(gcfg):  # noqa: F811
    """An LLM planner emitting the reference's cypher_query field drops in:
    the adapter lowers it to the structured op and derives graph seeds."""
    from triple_hybrid_rag_tpu.models.planner import CallablePlanner

    def llm(query):
        return {
            "keywords": ["acme"],
            "requires_graph": False,  # the cypher field overrides this
            "cypher_query": "MATCH (e:Entity {name: 'Acme Corp'})-[*1..2]-(r) "
                            "RETURN r LIMIT 10",
        }

    plan = CallablePlanner(llm, gcfg).plan("who partners with acme?")
    assert plan.requires_graph
    assert plan.graph_query == {
        "op": "neighborhood", "entity": "Acme Corp", "hops": 2, "limit": 10,
    }
    assert "Acme Corp" in plan.graph_entities

    # untranslatable Cypher degrades to the rule plan's seeds, not a failure
    bad = CallablePlanner(
        lambda q: {"cypher_query": "CREATE (n {name: 'x'})"}, gcfg
    ).plan("who partners with acme?")
    assert bad.graph_query is None


def test_execute_cypher_path_and_lookup(gcfg):  # noqa: F811
    corpus, store = build_graph_fixture(gcfg)
    gidx = build_graph_index(store, corpus, gcfg)
    res = gidx.execute_cypher(
        "MATCH p = shortestPath((a {name: 'John Smith'})-[*..4]-"
        "(b {name: 'CloudStack Systems'})) RETURN p"
    )
    assert res["found"]
    names = [n["name"] for n in res["nodes"]]
    assert names[0] == "John Smith" and names[-1] == "CloudStack Systems"

    look = gidx.execute_cypher(
        "MATCH (e:Entity) WHERE e.name CONTAINS $q RETURN e", {"q": "Acme"}
    )
    assert any(n["name"] == "Acme Corp" for n in look["nodes"])
