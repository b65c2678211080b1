"""Snippet / highlight generation — pdb.snippet, pdb.snippets,
pdb.snippet_positions (`/root/reference/pg_search/src/postgres/customscan/
basescan/projections/snippet.rs:33-131`), replicating tantivy's
SnippetGenerator fragmentation:

* tokens are accumulated into a fragment until ``token.offset_to -
  fragment_start > max_num_chars``; the overflowing token starts a new
  fragment at its own offset,
* a fragment scores the sum of matched-term scores (1.0 per query term
  occurrence); zero-score fragments are discarded,
* ``snippet`` = best-scoring fragment (first on ties); ``snippets`` = all
  scoring fragments in document order with limit/offset (default limit 5),
* highlight spans wrap each matched token; the fragment string ends at the
  last *token* end (trailing punctuation dropped), as the golden outputs in
  `pg_search/tests/pg_regress/expected/snippets.out:24-47` show.

Defaults: start_tag ``<b>``, end_tag ``</b>``, max_num_chars 150.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Optional

import pyarrow as pa

from paradedb_ray.query import ast
from paradedb_ray.schema import JSON, TEXT


@dataclass
class SnippetConfig:
    field: str
    start_tag: str = "<b>"
    end_tag: str = "</b>"
    max_num_chars: int = 150
    mode: str = "single"  # "single" | "multi" | "positions"
    limit: Optional[int] = None  # multi default 5
    offset: int = 0
    alias: Optional[str] = None

    @property
    def output_name(self) -> str:
        if self.alias:
            return self.alias
        return {"single": "snippet", "multi": "snippets",
                "positions": "snippet_positions"}[self.mode]


def query_terms_for_field(query: ast.Query, schema, field: str) -> set:
    """Exact terms the query mentions on ``field`` (used for highlighting).

    For a JSON dot-path, terms from EVERY path under the same base json
    field highlight (`snippet_json_02_advanced.out`: a `titles:test`
    clause highlights 'test' inside the `content` snippet too — tantivy
    collects snippet terms per FIELD, and the whole json column is one
    field)."""
    from paradedb_ray.stages.search_stages import collect_stat_requests

    req = collect_stat_requests(query, schema)
    base = field.split(".")[0]
    json_base = ("." in field and schema is not None
                 and base in getattr(schema, "fields", {})
                 and schema.field(base).ftype == JSON)
    if json_base:
        return {t for (f, t) in req["terms"] if f.split(".")[0] == base}
    return {t for (f, t) in req["terms"] if f == field}


@dataclass
class _Fragment:
    start: int
    stop: int = 0
    score: float = 0.0
    spans: list = dfield(default_factory=list)  # (char_from, char_to)


def _fragments(tokens, terms: set, max_num_chars: int):
    frags = []
    cur = _Fragment(start=0)
    for t in tokens:
        if t.offset_to - cur.start > max_num_chars:
            if cur.score > 0:
                frags.append(cur)
            cur = _Fragment(start=t.offset_from)
        cur.stop = t.offset_to
        if t.text in terms:
            cur.score += 1.0
            cur.spans.append((t.offset_from, t.offset_to))
    if cur.score > 0:
        frags.append(cur)
    return frags


def _render(text: str, frag: _Fragment, cfg: SnippetConfig) -> str:
    out = []
    pos = frag.start
    for s, e in frag.spans:
        out.append(text[pos:s])
        out.append(cfg.start_tag)
        out.append(text[s:e])
        out.append(cfg.end_tag)
        pos = e
    out.append(text[pos:frag.stop])
    return "".join(out)


def _byte_spans(text: str, spans: list) -> list:
    cum = [0]
    for c in text:
        cum.append(cum[-1] + len(c.encode("utf-8")))
    return [[cum[s], cum[e]] for s, e in spans]


def generate(text: Optional[str], analyzer, terms: set, cfg: SnippetConfig):
    """-> str (single) | list[str] (multi) | list[[int,int]] (positions)."""
    if text is None:
        return None if cfg.mode == "single" else []
    if isinstance(text, (list, tuple)):
        # varchar[] / text[] are flattened into a single space-joined
        # string before snippet generation, emulating tantivy's behavior
        # for highlighting text arrays (`scan_state.rs:447-461`); the
        # golden `snippet_position_01_basic.out` shows positions spanning
        # element boundaries ('test','snippet',... -> {{0,4},{5,12}})
        joined = " ".join(v for v in text if v is not None)
        return generate(joined, analyzer, terms, cfg)
    tokens = analyzer.tokenize_tokens(text)
    frags = _fragments(tokens, terms, cfg.max_num_chars)
    if cfg.mode == "positions":
        spans = [sp for f in frags for sp in f.spans]
        spans.sort()
        return _byte_spans(text, spans)
    if cfg.mode == "single":
        if not frags:
            return None
        best = max(frags, key=lambda f: f.score)  # first wins ties (max is stable)
        return _render(text, best, cfg)
    limit = cfg.limit if cfg.limit is not None else 5
    sel = frags[cfg.offset : cfg.offset + limit]
    return [_render(text, f, cfg) for f in sel]


def snippet_column(searcher, hits, cfg: SnippetConfig, terms: set) -> pa.Array:
    """Build the snippet output column for matched rows of a batch."""
    schema = searcher.schema
    if "." in cfg.field and cfg.field not in schema.fields:
        # JSON dot-path snippet (`snippet_json_01_basic.sql`): highlight
        # the extracted leaf text; arrays render space-joined (the golden
        # positions {{5,12}} for ["test","snippet"] are offsets into
        # "test snippet")
        base, path = cfg.field.split(".", 1)
        fdef = schema.field(base)
        if fdef.ftype != JSON:
            raise ValueError("snippets only on text/json fields")
        jvals = searcher.seg.json_path_values(base, path)
        texts = []
        for i in hits.ids:
            v = jvals[i]
            if isinstance(v, (list, tuple)):
                v = " ".join(e for e in v if isinstance(e, str)) or None
            elif not isinstance(v, str):
                v = None
            texts.append(v)
        an = fdef.analyzer
        # query terms arrive un-analyzed for JSON paths — normalize
        # through the field's chain so they match the token stream
        terms = {t for q in terms for t in an.tokenize(str(q))}
        vals = [generate(t, an, terms, cfg) for t in texts]
    else:
        fdef = schema.field(cfg.field)
        if fdef.ftype != TEXT:
            raise ValueError("snippets only on text fields")
        texts = searcher.seg.table.column(cfg.field).take(
            pa.array(hits.ids, pa.int64())).to_pylist()
        vals = [generate(t, fdef.analyzer, terms, cfg) for t in texts]
    if cfg.mode == "single":
        return pa.array(vals, pa.string())
    if cfg.mode == "positions":
        return pa.array(vals, pa.list_(pa.list_(pa.int64())))
    return pa.array(vals, pa.list_(pa.string()))
