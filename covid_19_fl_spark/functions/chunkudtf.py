"""Python UDTF surface (Spark 4): the lateral-join chunker.

The engine's production chunker is ``llmops.text.chunk_spans`` — pure
higher-order Column expressions inside whole-stage codegen, zero
Python. This module is the API-surface twin: the SAME chunking
semantics expressed as a Spark 4 Python UDTF, completing the
UDF/UDAF/UDTF inventory (SURVEY §2.12) the way `@pandas_udf` and
``applyInPandas``/``mapInPandas`` already cover the scalar and grouped
surfaces. Use it when per-row logic genuinely needs imperative Python
(real tokenizers, sentence splitters); keep the columnar twin for
anything a Column expression can say — the UDTF pays a Python worker
round-trip per partition that the codegen path never does.

Determinism contract: tokenization is ``re.split(r"\\s+", text.strip())``
— exactly the `words()` Column twin (F.split(trim, '\\s+')) and the
oracle's regexp_split_to_array, empty-string token included for empty
docs, so all three paths emit identical rows.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql.functions import udtf

CHUNK_SCHEMA = (
    "doc_id bigint, chunk_idx int, start_tok int, n_tok int, chunk_text string"
)


@udtf(returnType=CHUNK_SCHEMA)
class ChunkSpansUDTF:
    """Fixed-size overlapping token chunks: size 32, stride 24 —
    pinned to tx_chunk_spans' parameters so the two paths are
    row-for-row comparable (and share one oracle)."""

    SIZE = 32
    STRIDE = 24

    def eval(self, doc_id: int, text: str) -> Iterator[tuple]:
        toks = re.split(r"\s+", (text or "").strip())
        n = len(toks)
        size, stride = self.SIZE, self.STRIDE
        n_chunks = 1 + max(-(-(n - size) // stride), 0)  # 1 + ceil max 0
        for i in range(n_chunks):
            start = i * stride  # 0-based
            window = toks[start : start + size]
            yield (
                doc_id,
                i,
                start + 1,
                len(window),
                " ".join(window),
            )
