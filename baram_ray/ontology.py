"""Relation extraction → triples → RDF export (reference ontology stack).

Rebuilds ``src/ontology/extractor.rs``: the sentence-scoped regex relation
patterns (``:941-1030``), extraction with entity validation + verified
flag (``:1637-1800``), Triple construction with slugged entity IRIs
(``:1284-1307``), the Turtle / N-Triples / JSON-LD writers
(``:1422-1466, 1310-1325``) and the slug / turtle-escape helpers
(``:1474-1496``). The reference's patterns are Korean-news-specific
(NAME-ORG-TITLE shapes); this corpus is synthetic English-word text, so
the pattern TABLE is adapted to its vocabulary (tool-entity followed by
op-entity and the converse) while the machinery — sentence split,
pattern scan, entity validation, evidence-verification, swap-free
subject/object typing, confidence — mirrors the reference.

Everything runs as ``map_batches`` over the documents table; the RDF
writers emit one file per block (partitioned, resumable output).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# entity vocabulary shared with the NER stage (pipelines.analytics)
TOOL_RE = r"(spark|hash|vector|stream)"
OP_RE = r"(join|sort|merge|scan|filter|agg)"

# predicate → (pattern, subject_type, object_type); confidence 0.8 is the
# reference's initial relation confidence (extractor.rs:1746)
RELATION_PATTERNS: dict[str, tuple[re.Pattern, str, str]] = {
    "applies": (re.compile(rf"\b{TOOL_RE} {OP_RE}\b"), "tool", "op"),
    "feeds": (re.compile(rf"\b{OP_RE} {TOOL_RE}\b"), "op", "tool"),
}
RELATION_CONFIDENCE = 0.8

_SENT_SPLIT = re.compile(r"[.!?。]")


def extract_relations(text: str) -> list[dict]:
    """Relations in one document (reference extract_relations,
    ``extractor.rs:1637-1800``): sentence split, per-pattern scan,
    subject/object validated against the in-text entity set, verified =
    evidence re-check (the M11 hallucination check — both ends must
    literally appear in the sentence)."""
    out: list[dict] = []
    low = (text or "").lower()
    for sentence in _SENT_SPLIT.split(low):
        if not sentence.strip():
            continue
        for pred, (pat, s_type, o_type) in RELATION_PATTERNS.items():
            for m in pat.finditer(sentence):
                subject, obj = m.group(1), m.group(2)
                evidence = m.group(0)
                # entity validation: both ends occur in the sentence as
                # standalone words (regex match guarantees it — the check
                # is the reference's contract, kept explicit)
                verified = subject in sentence and obj in sentence
                out.append({
                    "subject": subject, "subject_type": s_type,
                    "predicate": pred,
                    "object": obj, "object_type": o_type,
                    "confidence": RELATION_CONFIDENCE,
                    "evidence": evidence, "verified": verified,
                })
    return out


def relations_stage(batch: pa.Table) -> pa.Table:
    """map_batches UDF: documents → aggregated relation rows per doc
    (doc_id, subject, predicate, object, n, verified)."""
    rows = {"doc_id": [], "subject": [], "predicate": [], "object": [],
            "n": [], "confidence": [], "verified": []}
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        agg: dict[tuple, list] = {}
        for r in extract_relations(t):
            key = (r["subject"], r["predicate"], r["object"])
            if key in agg:
                agg[key][0] += 1
                agg[key][1] = agg[key][1] and r["verified"]
            else:
                agg[key] = [1, r["verified"]]
        for (s, p, o), (n, v) in sorted(agg.items()):
            rows["doc_id"].append(d)
            rows["subject"].append(s)
            rows["predicate"].append(p)
            rows["object"].append(o)
            rows["n"].append(n)
            rows["confidence"].append(RELATION_CONFIDENCE)
            rows["verified"].append(v)
    return pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "subject": pa.array(rows["subject"], pa.string()),
        "predicate": pa.array(rows["predicate"], pa.string()),
        "object": pa.array(rows["object"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "confidence": pa.array(rows["confidence"], pa.float64()),
        "verified": pa.array(rows["verified"], pa.bool_()),
    })


# ------------------------------------------------------------------ #
# M17: slug + turtle escaping (reference extractor.rs:1474-1496)
# ------------------------------------------------------------------ #

def slug(text: str) -> str:
    """URL-safe slug: alnum/-/_ kept, everything else → '_', lowercased
    (reference ``fn slug``, extractor.rs:1474-1486)."""
    return "".join(c if (c.isalnum() or c in "-_") else "_"
                   for c in text).lower()


def turtle_escape(s: str) -> str:
    """IRIs (http(s) or prefixed names) → <...>; literals → quoted with
    backslash/quote escaping (reference ``fn turtle_escape``,
    extractor.rs:1488-1496)."""
    if s.startswith(("http://", "https://")) or ":" in s:
        return f"<{s}>"
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


# ------------------------------------------------------------------ #
# Triples + writers (S10)
# ------------------------------------------------------------------ #

def triples_from_relations(df: pd.DataFrame) -> pd.DataFrame:
    """Relation rows → Triple rows with slugged IRIs (reference
    Triple::from_relation, extractor.rs:1284-1307):
    ``baram:entity/{article_id}/{slug(name)}`` subject/object ids and a
    ``baram:rel/{predicate}`` predicate IRI."""
    out = df.copy()
    out["subject_id"] = [f"baram:entity/{d}/{slug(s)}"
                         for d, s in zip(df["doc_id"], df["subject"])]
    out["object_id"] = [f"baram:entity/{d}/{slug(o)}"
                        for d, o in zip(df["doc_id"], df["object"])]
    out["predicate_iri"] = [f"baram:rel/{p}" for p in df["predicate"]]
    return out


def triple_to_ntriples(subject_id: str, predicate_iri: str,
                       object_id: str) -> str:
    """``<s> <p> <o> .`` (reference Triple::to_ntriples,
    extractor.rs:1310-1315)."""
    return f"<{subject_id}> <{predicate_iri}> <{object_id}> ."


def triple_to_turtle(subject_id: str, predicate_iri: str,
                     object_id: str) -> str:
    """(reference Triple::to_turtle, extractor.rs:1317-1325)."""
    return (f"{turtle_escape(subject_id)} {turtle_escape(predicate_iri)} "
            f"{turtle_escape(object_id)} .")


TURTLE_PREFIXES = (
    "@prefix schema: <https://schema.org/> .\n"
    "@prefix baram: <https://baram.example.org/ontology/> .\n"
    "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n\n"
)


def to_turtle(triples: pd.DataFrame) -> str:
    """Turtle document for a triple frame (reference TripleStore::
    to_turtle, extractor.rs:1427-1457 — prefixes, comment per triple,
    evidence comments omitted: the aggregated rows carry counts)."""
    lines = [TURTLE_PREFIXES]
    for _, r in triples.iterrows():
        lines.append(f"# {r['subject']} {r['predicate']} {r['object']}\n")
        lines.append(triple_to_turtle(r["subject_id"], r["predicate_iri"],
                                      r["object_id"]) + "\n\n")
    return "".join(lines)


def to_ntriples(triples: pd.DataFrame) -> str:
    """(reference TripleStore::to_ntriples, extractor.rs:1460-1466)."""
    return "\n".join(triple_to_ntriples(s, p, o) for s, p, o in
                     zip(triples["subject_id"], triples["predicate_iri"],
                         triples["object_id"]))


def write_rdf(relations_ds, out_dir: str, fmt: str = "nt"):
    """S10 writer: one ``.nt``/``.ttl`` file PER BLOCK, named by the
    block's doc_id range → partitioned, order-independent, resumable
    output (a re-run overwrites the same file names). Returns a manifest
    Dataset (path, n_triples)."""
    assert fmt in ("nt", "ttl")
    os.makedirs(out_dir, exist_ok=True)

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"path": pd.Series([], dtype="object"),
                                 "n_triples": pd.Series([], dtype="int64")})
        t = triples_from_relations(df)
        lo, hi = int(df["doc_id"].min()), int(df["doc_id"].max())
        path = os.path.join(out_dir, f"triples-{lo}-{hi}.{fmt}")
        body = to_ntriples(t) if fmt == "nt" else to_turtle(t)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:          # atomic tmp+rename, reference
            f.write(body)                  # checkpoint.rs:216-217 style
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path], "n_triples": [len(t)]})

    return relations_ds.map_batches(write_block, batch_format="pandas")
