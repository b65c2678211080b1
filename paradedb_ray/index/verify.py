"""amcheck-style index verification — the engine's twin of
``pdb.verify_index`` (`pg_search/src/api/admin.rs:1103`, regress
`verify_bm25_index.sql`): structural checks over every segment, plus an
optional ``heapallindexed``-style pass that proves the visibility map
and the stored rows agree (the analogue of heap-reference checking —
there is no Postgres heap here, the docstore IS the heap).

Check names mirror the reference's:
* ``schema_valid`` — every indexed schema field has a well-formed
  per-segment structure (postings arrays aligned, fieldnorms sized).
* ``index_readable`` — postings decode end-to-end: offsets monotone,
  doc ids in range, tf >= 1, position run lengths == tf.
* ``checksums_valid`` — derived statistics re-derive identically
  (total_tokens == sum tf, doc_count == has_value count).
* ``segment_metadata_valid`` — table/num_docs agreement per segment.
* ``heap_references_valid`` (heapallindexed) — every LIVE key in the
  visibility map resolves to exactly one stored row and vice versa.
"""

from __future__ import annotations

import numpy as np

from paradedb_ray.schema import TEXT, VECTOR, IndexSchema


def verify_segment(seg, schema: IndexSchema) -> dict:
    """Per-segment structural checks -> {check_name: bool}."""
    ok = {"schema_valid": True, "index_readable": True,
          "checksums_valid": True, "segment_metadata_valid": True}
    n = seg.num_docs
    if seg.table.num_rows != n:
        ok["segment_metadata_valid"] = False
    for fname, f in schema.fields.items():
        if f.ftype == TEXT and f.indexed:
            ti = seg.text.get(fname)
            if ti is None:
                continue
            if (len(ti.fieldnorm_ids) != n or len(ti.has_value) != n
                    or len(ti.term_offsets) != len(ti.vocab) + 1):
                ok["schema_valid"] = False
                continue
            offs = ti.term_offsets
            if (np.any(np.diff(offs) < 0) or offs[0] != 0
                    or offs[-1] != len(ti.g_doc)
                    or len(ti.g_tf) != len(ti.g_doc)):
                ok["index_readable"] = False
                continue
            if len(ti.g_doc) and (ti.g_doc.min() < 0 or ti.g_doc.max() >= n
                                  or (ti.g_tf < 1).any()):
                ok["index_readable"] = False
            if ti.g_pos_off is not None:
                lens = np.diff(ti.g_pos_off)
                if (len(ti.g_pos_off) != len(ti.g_doc) + 1
                        or ti.g_pos_off[-1] != len(ti.pos_flat)
                        or not np.array_equal(lens, ti.g_tf)):
                    ok["index_readable"] = False
            if (ti.total_tokens != int(ti.g_tf.sum())
                    or ti.doc_count != int(ti.has_value.sum())):
                ok["checksums_valid"] = False
        elif f.ftype == VECTOR and fname in seg.table.column_names:
            try:
                mat, valid = seg.vector_matrix(fname)
                if len(valid) != n or (valid.any()
                                       and not np.isfinite(mat[valid]).all()):
                    ok["index_readable"] = False
            except ValueError:
                ok["index_readable"] = False
        elif fname not in seg.table.column_names and f.indexed \
                and f.expr_source is None and not f.is_key:
            # a declared field absent from the docstore is a schema gap,
            # not corruption — tolerated (stores build uniform segments)
            pass
    return ok


def schema_info(schema: IndexSchema):
    """``paradedb.schema(index)`` analogue (`api/index.rs` schema table
    function; regress `tokenize-uuid.sql` output shape): one row per
    field with the tantivy-style type name, flags and tokenizer chain.

    Columns mirror the reference: name, field_type, stored, indexed,
    fast, fieldnorms, expand_dots, tokenizer, record, normalizer.
    """
    import pyarrow as pa

    from paradedb_ray import schema as S

    type_names = {
        S.TEXT: "Str", S.KEYWORD: "Str", S.I64: "I64", S.U64: "U64",
        S.F64: "F64", S.BOOL: "Bool", S.DATE: "Date", S.JSON: "Json",
        S.UUID: "Str", S.INET: "Str", S.LTREE: "Facet",
        S.VECTOR: "F32Vec",
    }

    def tok_str(f) -> str:
        if f.ftype not in (S.TEXT, S.KEYWORD, S.JSON):
            return ""
        cfg = dict(f.tokenizer or {})
        t = cfg.pop("type", "default")
        extras = ",".join(f"{k}={v}" for k, v in sorted(cfg.items()))
        return f"{t}[{extras}]" if extras else t

    rows = {"name": [], "field_type": [], "stored": [], "indexed": [],
            "fast": [], "fieldnorms": [], "expand_dots": [],
            "tokenizer": [], "record": [], "normalizer": []}
    for f in schema.fields.values():
        if f.ftype == S.NUMERIC:
            ftype = "I64" if f.scale is not None else "Bytes"
        else:
            ftype = type_names.get(f.ftype, "Str")
        text_like = f.ftype in (S.TEXT, S.JSON)
        rows["name"].append(f.name)
        rows["field_type"].append(ftype)
        rows["stored"].append(True)  # the docstore IS the heap here
        rows["indexed"].append(bool(f.indexed))
        rows["fast"].append(bool(f.fast))
        rows["fieldnorms"].append(text_like)
        rows["expand_dots"].append(True if f.ftype == S.JSON else None)
        rows["tokenizer"].append(tok_str(f))
        rows["record"].append(
            ("position" if f.positions else "freq") if text_like
            else ("basic" if f.ftype == S.KEYWORD else ""))
        rows["normalizer"].append("raw" if f.ftype == S.KEYWORD else "")
    return pa.table({
        "name": pa.array(rows["name"], pa.string()),
        "field_type": pa.array(rows["field_type"], pa.string()),
        "stored": pa.array(rows["stored"], pa.bool_()),
        "indexed": pa.array(rows["indexed"], pa.bool_()),
        "fast": pa.array(rows["fast"], pa.bool_()),
        "fieldnorms": pa.array(rows["fieldnorms"], pa.bool_()),
        "expand_dots": pa.array(rows["expand_dots"], pa.bool_()),
        "tokenizer": pa.array(rows["tokenizer"], pa.string()),
        "record": pa.array(rows["record"], pa.string()),
        "normalizer": pa.array(rows["normalizer"], pa.string()),
    })
