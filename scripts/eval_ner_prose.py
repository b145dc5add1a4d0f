"""Prose NER/RE quality measurement (round-5 verdict task #6).

Round 4 scored the extractor only against the AST oracle on code docstrings
(triple recall 0.975 with code-identifier NER). The reference's taxonomy
targets natural-language business prose — people, orgs, money, dates, PT/EN
(reference rag2/entity_extraction.py:104-148, 15 entity types). This harness
measures ``RuleBasedExtractor`` precision/recall per entity type on a
hermetically *templated* PT+EN business-prose corpus with exact ground truth.

Honesty note: the sentences are generated from templates written for this
eval, so the numbers measure PATTERN COVERAGE over realistic sentence forms
(titles, org suffixes, date formats, money formats, relation verbs, distractor
sentence-initial capitals), not open-domain NER. Distractor constructions that
the extractor is *expected* to resist (sentence-initial common words, ALL-CAPS
acronyms <= 2 chars, lowercase nouns) are included and count against precision
when hallucinated.

Usage: python scripts/eval_ner_prose.py [--docs 150] [--seed 0]
Writes eval_results/ner_prose.json with per-type P/R + relation P/R.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from triple_hybrid_rag_tpu.models.entity_extractor import (
    RuleBasedExtractor,
    canonical_key,
)
from triple_hybrid_rag_tpu.types import ChildChunk, EntityType, ParentChunk

# ---------------------------------------------------------------------------
# name pools (synthetic; PT + EN business register)
# ---------------------------------------------------------------------------
PERSON_FIRST = ["Maria", "João", "Ana", "Carlos", "Fernanda", "Ricardo",
                "Beatriz", "Paulo", "John", "Sarah", "Michael", "Laura",
                "David", "Emily", "Rafael", "Camila"]
PERSON_LAST = ["Silva", "Santos", "Oliveira", "Pereira", "Costa", "Almeida",
               "Carter", "Johnson", "Mitchell", "Brooks", "Ferreira", "Ramos"]
ORG_CORE = ["Acme", "Vertex", "Nordeste", "Atlas", "Meridian", "Horizonte",
            "Pinnacle", "Lumina", "Cascata", "Ironwood", "Solara", "Quantum"]
ORG_TAIL = ["Soluções", "Consultoria", "Logistics", "Partners", "Engenharia",
            "Analytics", "Holdings", "Serviços", "Systems", "Capital"]
ORG_SUFFIX = ["Ltda", "S.A.", "Inc", "LLC", "Corp", "ME", "Group", "SA"]
LOCATIONS = ["São Paulo", "Rio de Janeiro", "Lisboa", "Porto Alegre",
             "New York", "Belo Horizonte", "Curitiba", "Boston", "Recife",
             "Salvador", "Chicago", "Fortaleza"]
PRODUCTS = ["Plataforma Aurora", "Sistema Vega", "Orion Suite",
            "Painel Estrela", "Falcon Engine", "Modulo Gama"]
MONTHS_PT = ["janeiro", "fevereiro", "março", "abril", "maio", "junho",
             "julho", "agosto", "setembro", "outubro", "novembro", "dezembro"]
MONTHS_EN = ["January", "February", "March", "April", "May", "June", "July",
             "August", "September", "October", "November", "December"]

# distractor sentence heads: sentence-initial capitalized common words the
# extractor must NOT emit as entities (they lower precision when it does)
DISTRACTOR_HEADS = [
    "Entretanto, o relatório indica que os prazos foram cumpridos.",
    "Finally, the committee approved the revised budget without objections.",
    "Durante a auditoria, nenhuma irregularidade foi encontrada.",
    "Meanwhile, quarterly targets remain unchanged for the region.",
    "Além disso, o cronograma permanece válido até segunda ordem.",
    "However, the board requested additional documentation last week.",
]


def _person(rng):
    return f"{PERSON_FIRST[rng.integers(len(PERSON_FIRST))]} " \
           f"{PERSON_LAST[rng.integers(len(PERSON_LAST))]}"


def _org(rng, suffix_p=0.6):
    core = f"{ORG_CORE[rng.integers(len(ORG_CORE))]} " \
           f"{ORG_TAIL[rng.integers(len(ORG_TAIL))]}"
    if rng.random() < suffix_p:
        core += f" {ORG_SUFFIX[rng.integers(len(ORG_SUFFIX))]}"
    return core


def _date(rng):
    kind = rng.integers(4)
    y = int(2019 + rng.integers(7))
    mo = int(rng.integers(12))
    d = int(1 + rng.integers(28))
    if kind == 0:
        return f"{d:02d}/{mo + 1:02d}/{y}"
    if kind == 1:
        return f"{y}-{mo + 1:02d}-{d:02d}"
    if kind == 2:
        return f"{MONTHS_EN[mo]} {d}, {y}"
    return f"{MONTHS_PT[mo]} de {y}"


def _money(rng):
    amt = f"{int(1 + rng.integers(999))}.{int(rng.integers(1000)):03d},00"
    if rng.random() < 0.5:
        return f"R$ {amt}"
    return f"{int(1 + rng.integers(900))},500.00 dollars"


# each template: (language, sentence factory) -> (text, entities, relations)
# entities: list of (surface, EntityType); relations: (subj, type_str, obj)
def make_sentence(rng):
    t = int(rng.integers(10))
    p, o, o2 = _person(rng), _org(rng), _org(rng)
    loc = LOCATIONS[rng.integers(len(LOCATIONS))]
    prod = PRODUCTS[rng.integers(len(PRODUCTS))]
    dt, mon = _date(rng), _money(rng)
    E, R = EntityType, []
    if t == 0:
        txt = f"{p} trabalha para a empresa {o} desde {dt}."
        ents = [(p, E.PERSON), (o, E.ORGANIZATION), (dt, E.DATE)]
        R = [(p, "works_for", o)]
    elif t == 1:
        txt = f"{p} works for {o} and is based in {loc}."
        ents = [(p, E.PERSON), (o, E.ORGANIZATION), (loc, E.LOCATION)]
        R = [(p, "works_for", o), (p, "located_in", loc)]
    elif t == 2:
        txt = f"A {o} está sediada em {loc} e faz parte de {o2}."
        ents = [(o, E.ORGANIZATION), (loc, E.LOCATION), (o2, E.ORGANIZATION)]
        R = [(o, "located_in", loc), (o, "part_of", o2)]
    elif t == 3:
        txt = f"O contrato foi assinado por {p} em {dt}, no valor de {mon}."
        ents = [(p, E.PERSON), (dt, E.DATE), (mon, E.MONEY)]
    elif t == 4:
        txt = f"{o} produces the {prod} and provides support from {loc}."
        ents = [(o, E.ORGANIZATION), (prod, E.PRODUCT), (loc, E.LOCATION)]
        R = [(o, "produces", prod)]
    elif t == 5:
        txt = f"Dr. {p} assinou o acordo com a {o} em {dt}."
        ents = [(p, E.PERSON), (o, E.ORGANIZATION), (dt, E.DATE)]
    elif t == 6:
        txt = f"A mensalidade do {prod} custa {mon} a partir de {dt}."
        ents = [(prod, E.PRODUCT), (mon, E.MONEY), (dt, E.DATE)]
        R = [(prod, "costs", mon)]
    elif t == 7:
        txt = f"{o} depends on {o2} for logistics in {loc}."
        ents = [(o, E.ORGANIZATION), (o2, E.ORGANIZATION), (loc, E.LOCATION)]
        R = [(o, "depends_on", o2)]
    elif t == 8:
        txt = f"{p} utiliza o {prod} nas operações da {o}."
        ents = [(p, E.PERSON), (prod, E.PRODUCT), (o, E.ORGANIZATION)]
        R = [(p, "uses", prod)]
    else:
        txt = f"{o} oferece consultoria para {o2} em {loc} desde {dt}."
        ents = [(o, E.ORGANIZATION), (o2, E.ORGANIZATION), (loc, E.LOCATION),
                (dt, E.DATE)]
        R = [(o, "provides", o2)]
    return txt, ents, R


# gold typing uses the surface the generator CHOSE; products here are
# capitalized multiword names — the extractor's taxonomy maps unknown
# capitalized multiword spans to ORGANIZATION/CONCEPT, so PRODUCT serves as
# the hardest typing class in this eval (no lexical cue).
def make_doc(rng, n_sent=(3, 7)):
    n = int(rng.integers(n_sent[0], n_sent[1]))
    sents, gold_e, gold_r = [], {}, set()
    for _ in range(n):
        if rng.random() < 0.25:
            sents.append(DISTRACTOR_HEADS[rng.integers(len(DISTRACTOR_HEADS))])
            continue
        txt, ents, rels = make_sentence(rng)
        sents.append(txt)
        # gold keys go through the extractor's own name normalization
        # (add_entity strips trailing punctuation: "S.A." == "S.A")
        for surface, et in ents:
            gold_e.setdefault(canonical_key(surface.strip(" .,;:")), et)
        for s, rt, ob in rels:
            gold_r.add((canonical_key(s.strip(" .,;:")), rt,
                        canonical_key(ob.strip(" .,;:"))))
    return " ".join(sents), gold_e, gold_r


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=150)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="eval_results/ner_prose.json")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    ex = RuleBasedExtractor()

    tp = {}, {}
    per_type_tp, per_type_fn, per_type_fp = {}, {}, {}
    span_tp = span_fn = 0
    rel_tp = rel_fn = rel_fp = 0
    fp_examples, fn_examples = [], []
    rel_fn_examples, rel_fp_examples = [], []

    for i in range(args.docs):
        text, gold_e, gold_r = make_doc(rng)
        parent = ParentChunk(parent_id=f"p{i}", doc_id="d", parent_idx=i,
                             text=text)
        child = ChildChunk(chunk_id=f"c{i}", parent_id=f"p{i}", doc_id="d",
                           parent_idx=i, child_idx=0, text=text)
        res = ex.extract(parent, [child])
        pred = {canonical_key(e.canonical_name): e.entity_type
                for e in res.entities}
        for key, et in gold_e.items():
            if key in pred:
                span_tp += 1
                if pred[key] == et:
                    per_type_tp[et.value] = per_type_tp.get(et.value, 0) + 1
                else:
                    per_type_fn[et.value] = per_type_fn.get(et.value, 0) + 1
                    per_type_fp[pred[key].value] = (
                        per_type_fp.get(pred[key].value, 0) + 1)
                    if len(fn_examples) < 12:
                        fn_examples.append(
                            f"{key}: gold={et.value} pred={pred[key].value}")
            else:
                span_fn += 1
                per_type_fn[et.value] = per_type_fn.get(et.value, 0) + 1
                if len(fn_examples) < 12:
                    fn_examples.append(f"{key}: gold={et.value} pred=MISSED")
        for key, et in pred.items():
            if key not in gold_e:
                per_type_fp[et.value] = per_type_fp.get(et.value, 0) + 1
                if len(fp_examples) < 12:
                    fp_examples.append(f"{key} ({et.value})")

        ents_by_id = {e.entity_id: canonical_key(e.canonical_name)
                      for e in res.entities}
        pred_r = {(ents_by_id.get(r.subject_id),
                   r.relation_type.value,
                   ents_by_id.get(r.object_id))
                  for r in res.relations}
        # co-occurrence RELATED_TO/MENTIONS edges are recall scaffolding for
        # the graph channel, not typed claims — exclude from typed-relation P
        pred_typed = {r for r in pred_r
                      if r[1] not in ("related_to", "mentions")}
        rel_tp += len(pred_typed & gold_r)
        rel_fn += len(gold_r - pred_typed)
        rel_fp += len(pred_typed - gold_r)
        for r in list(gold_r - pred_typed)[:2]:
            if len(rel_fn_examples) < 12:
                rel_fn_examples.append(" ".join(map(str, r)))
        for r in list(pred_typed - gold_r)[:2]:
            if len(rel_fp_examples) < 12:
                rel_fp_examples.append(" ".join(map(str, r)))

    def pr(tp_, fp_, fn_):
        p = tp_ / (tp_ + fp_) if tp_ + fp_ else None
        r = tp_ / (tp_ + fn_) if tp_ + fn_ else None
        return p, r

    per_type = {}
    for t in sorted(set(per_type_tp) | set(per_type_fn) | set(per_type_fp)):
        p, r = pr(per_type_tp.get(t, 0), per_type_fp.get(t, 0),
                  per_type_fn.get(t, 0))
        per_type[t] = {
            "precision": None if p is None else round(p, 4),
            "recall": None if r is None else round(r, 4),
            "tp": per_type_tp.get(t, 0), "fp": per_type_fp.get(t, 0),
            "fn": per_type_fn.get(t, 0),
        }
    rp, rr = pr(rel_tp, rel_fp, rel_fn)
    all_tp = sum(per_type_tp.values())
    mp, mr = pr(all_tp, sum(per_type_fp.values()), sum(per_type_fn.values()))
    payload = {
        "n_docs": args.docs, "seed": args.seed,
        "methodology": "templated PT+EN business prose, exact ground truth; "
                       "measures pattern coverage, not open-domain NER",
        "span_recall": round(span_tp / (span_tp + span_fn), 4),
        "micro_precision_typed": None if mp is None else round(mp, 4),
        "micro_recall_typed": None if mr is None else round(mr, 4),
        "per_type": per_type,
        "relations": {
            "precision": None if rp is None else round(rp, 4),
            "recall": None if rr is None else round(rr, 4),
            "tp": rel_tp, "fp": rel_fp, "fn": rel_fn,
        },
        "fp_examples": fp_examples,
        "fn_examples": fn_examples,
        "rel_fn_examples": rel_fn_examples,
        "rel_fp_examples": rel_fp_examples,
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
