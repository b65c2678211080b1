"""Index schema registry — the Python twin of pg_search's ``SearchIndexSchema``
(`/root/reference/pg_search/src/schema/mod.rs:392-421`): per-field type,
tokenizer config, fast/indexed flags, and the unique key field(s)
(``WITH (key_field='id')``, `pg_search/src/postgres/options.rs`).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from functools import cached_property
from typing import Any, Optional

from paradedb_ray.text.tokenizers import Tokenizer, tokenizer_from_config

#: field type lattice (SearchFieldType, `schema/mod.rs:60-82`)
TEXT = "text"
KEYWORD = "keyword"  # literal/keyword-tokenized string
I64 = "i64"
U64 = "u64"
F64 = "f64"
BOOL = "bool"
DATE = "date"
JSON = "json"
#: NUMERIC(p, s): scaled-i64 fixed point when ``scale`` is set (p <= 18),
#: order-preserving NumericBytes otherwise (`query/numeric.rs:1-472`,
#: `schema/mod.rs:73-78`)
NUMERIC = "numeric"
#: canonicalized Postgres types (`postgres/types.rs:1134-1232`) and the
#: hierarchical ltree facet (`schema/mod.rs:65`, `ltree.sql` regress)
UUID = "uuid"
INET = "inet"
LTREE = "ltree"
#: case-insensitive text (`citext.sql` regress): plain TEXT through the
#: default tokenizer chain — the chain's lowercase step IS the
#: case-insensitivity; === stays a raw (case-sensitive) term lookup
CITEXT = "citext"
#: pgvector column inside the index (`vector_search_pushdown.sql`,
#: `pg_search/src/vector/`): fixed-dim float vector served as a fast
#: field; ``metric`` is the opclass analogue (vector_l2_ops -> "l2",
#: vector_cosine_ops -> "cosine", vector_ip_ops -> "ip") and names the
#: ONE distance operator that pushes down through top-k
VECTOR = "vector"

NUMERIC_TYPES = {I64, U64, F64, BOOL, DATE, NUMERIC}


@dataclass
class Field:
    name: str
    ftype: str = TEXT
    tokenizer: Optional[dict] = None  # pg_search-style JSON tokenizer config
    indexed: bool = True
    fast: bool = False
    positions: bool = True  # record positions (needed for phrase/proximity)
    is_key: bool = False
    #: per-field BM25 parameters (``pdb.simple('k1=0.0')`` etc.,
    #: `bm25-params.sql`); None = tantivy defaults k1=1.2, b=0.75
    k1: Optional[float] = None
    b: Optional[float] = None
    #: indexed expression (`(lower(description)::pdb.simple(
    #: 'alias=description_lower'))`, `operators.sql:17-20`): this field is
    #: DERIVED from ``expr_source`` via ``expr_fn`` (callable
    #: pa.Array -> pa.Array) at segment-build time
    expr_source: Optional[str] = None
    expr_fn: Optional[Any] = None
    #: NUMERIC(p, s) scale: set -> Numeric64 scaled-i64; None on a NUMERIC
    #: field -> NumericBytes arbitrary precision
    scale: Optional[int] = None
    #: search-time tokenizer override (`search_tokenizer.sql`): tokenizes
    #: QUERY text while the index keeps its own tokenizer — the
    #: autocomplete pattern (edge-ngram index, unicode_words search)
    search_tokenizer: Optional[dict] = None
    #: VECTOR params: dimension (``vector(3)`` typmod) and opclass metric
    #: ("l2" | "cosine" | "ip"); the declared metric is the only distance
    #: operator that pushes down through top-k (mismatches fall back to a
    #: full sort with a warning, `vector_search_pushdown.sql`)
    dim: Optional[int] = None
    metric: str = "cosine"

    @cached_property
    def search_analyzer(self) -> Tokenizer:
        """Query-side analyzer: ``search_tokenizer`` when set, else the
        index analyzer (`search_tokenizer.sql`)."""
        if self.search_tokenizer is not None:
            return tokenizer_from_config(self.search_tokenizer)
        return self.analyzer

    @cached_property
    def analyzer(self) -> Tokenizer:
        if self.ftype == TEXT:
            return tokenizer_from_config(self.tokenizer)
        if self.ftype == KEYWORD:
            cfg = self.tokenizer or {"type": "literal"}
            return tokenizer_from_config(cfg)
        if self.ftype == JSON:
            # tantivy JSON fields tokenize string leaf values with the
            # field's text analyzer (default chain unless configured) —
            # `snippet_json_01_basic.sql`: 'description:test' matches
            # the value "A test author"
            return tokenizer_from_config(self.tokenizer)
        raise ValueError(f"field {self.name!r} ({self.ftype}) has no analyzer")


@dataclass
class IndexSchema:
    fields: dict = dfield(default_factory=dict)  # name -> Field
    key_fields: list = dfield(default_factory=list)

    @staticmethod
    def build(key_field, **field_defs) -> "IndexSchema":
        """``IndexSchema.build(key_field="id", description={"type": "text"},
        rating={"type": "i64", "fast": True})``"""
        keys = [key_field] if isinstance(key_field, str) else list(key_field)
        fields = {}
        for name, d in field_defs.items():
            if isinstance(d, str):
                d = {"type": d}
            ftype = d.get("type", TEXT)
            if ftype == CITEXT:
                ftype = TEXT  # citext == TEXT + default (lowercasing) chain
            fields[name] = Field(
                name=name,
                ftype=ftype,
                tokenizer=d.get("tokenizer"),
                indexed=d.get("indexed", True),
                fast=d.get("fast", d.get("type") in NUMERIC_TYPES),
                positions=d.get("positions", True),
                is_key=name in keys,
                k1=d.get("k1"),
                b=d.get("b"),
                # "column" is the pg_search spelling for a field that
                # re-indexes another column under a second configuration
                # (`ngram-text-array.sql`: all_titles_ngram.column)
                expr_source=d.get("expr_source") or d.get("column"),
                expr_fn=d.get("expr_fn"),
                scale=d.get("scale"),
                search_tokenizer=d.get("search_tokenizer"),
                dim=d.get("dim"),
                metric=d.get("metric", "cosine"),
            )
        for k in keys:
            if k not in fields:
                fields[k] = Field(name=k, ftype=I64, indexed=True, fast=True,
                                  is_key=True)
        return IndexSchema(fields=fields, key_fields=keys)

    def field(self, name: str) -> Field:
        f = self.fields.get(name)
        if f is None:
            raise KeyError(f"field {name!r} not in index schema")
        return f

    @cached_property
    def text_fields(self) -> list:
        return [f.name for f in self.fields.values() if f.ftype in (TEXT, KEYWORD)]

    @cached_property
    def default_search_fields(self) -> list:
        """Fields targeted by un-scoped `parse` queries."""
        return [f.name for f in self.fields.values() if f.ftype == TEXT and f.indexed]

    def column_names(self) -> list:
        return list(self.fields)


# The driver-mandated transcripts schema (BASELINE.json input_hint);
# index config per FIXTURES.md §1.
def transcripts_schema() -> IndexSchema:
    return IndexSchema.build(
        key_field=["conv_id", "turn_idx"],
        conv_id={"type": KEYWORD, "fast": True},
        turn_idx={"type": I64, "fast": True},
        role={"type": KEYWORD, "fast": True},
        text={"type": TEXT},
        tool={"type": KEYWORD, "fast": True},
        ts={"type": DATE, "fast": True},
    )


# The synthetic `documents` table from /root/testdata (doc_id, text, lang,
# source, n_chars).
def documents_schema() -> IndexSchema:
    return IndexSchema.build(
        key_field="doc_id",
        doc_id={"type": I64, "fast": True},
        text={"type": TEXT},
        lang={"type": KEYWORD, "fast": True},
        source={"type": KEYWORD, "fast": True},
        n_chars={"type": I64, "fast": True},
    )


# The synthetic `events` stream table (event_id, ts, user_id, event_type,
# value, props) — props is a JSON column with dot-path addressing.
def events_schema() -> IndexSchema:
    return IndexSchema.build(
        key_field="event_id",
        event_id={"type": I64, "fast": True},
        ts={"type": DATE, "fast": True},
        user_id={"type": I64, "fast": True},
        event_type={"type": KEYWORD, "fast": True},
        value={"type": F64, "fast": True},
        props={"type": JSON},
    )


# Faithful twin of the pg_regress `mock_items` bm25 index
# (FIXTURES.md §2; `pg_search/tests/pg_regress/sql/topk_scores.sql`).
def mock_items_schema() -> IndexSchema:
    return IndexSchema.build(
        key_field="id",
        id={"type": I64, "fast": True},
        description={"type": TEXT},
        rating={"type": I64, "fast": True},
        category={"type": KEYWORD, "tokenizer": {"type": "keyword"}, "fast": True},
        in_stock={"type": BOOL, "fast": True},
        metadata={"type": JSON, "fast": True},
        created_at={"type": DATE, "fast": True},
        last_updated_date={"type": DATE, "fast": True},
        latest_available_time={"type": DATE, "fast": True},
    )
