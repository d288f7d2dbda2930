"""Python user-defined TABLE functions (Spark 4 UDTF API) — the lateral
one-row-to-many lane for operators whose output cardinality varies per row.

Where it fits: explode+transform covers array-shaped expansion; UDTFs cover
expansion with per-row CONTROL FLOW (variable chunk counts, early exits)
while staying a planned table source (`... , LATERAL chunk_document(text)`)
that Catalyst joins like any other relation. Arrow-optimized
(``useArrow=True``) so the plan node is ArrowEvalPythonUDTF — inside the
engine's "Python only when Arrow-batched" rule, enforced registry-wide by
tests/test_plan_invariants.py.

Chunking contract (shared with the DuckDB oracle, change together):
tokens = whitespace split of the raw text; chunk starts at 0, stride,
2*stride, ... for every start < n_tokens (stride = chunk_size - overlap);
chunk i = tokens[start : start + chunk_size] (final chunks may be short).
This is the standard overlapping-window chunking an embedding/RAG pipeline
feeds to an encoder with bounded context.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_id int, chunk_text string, n_chunk_tokens int",
    useArrow=True,
)
class ChunkDocument:
    """LATERAL chunk_document(text, chunk_size, overlap) -> one row per
    overlapping token window. Deterministic, pure; yields nothing for
    empty/whitespace-only text."""

    def eval(self, text: str, chunk_size: int, overlap: int):
        if not text:
            return
        toks = text.split()
        n = len(toks)
        if n == 0:
            return
        stride = max(chunk_size - overlap, 1)
        cid = 0
        for start in range(0, n, stride):
            window = toks[start : start + chunk_size]
            yield cid, " ".join(window), len(window)
            cid += 1


def register_udtfs(spark) -> None:
    """Idempotently register every table function under its SQL name."""
    spark.udtf.register("chunk_document", ChunkDocument)
