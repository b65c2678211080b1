from paradedb_ray.functions.text_analysis import (  # noqa: F401
    tokenize_table,
    add_token_count,
    add_quality_score,
    add_repetition,
    add_langid,
    add_fingerprint,
    chunk_documents,
    scrub_text,
    decontaminate,
    pack_documents,
)
