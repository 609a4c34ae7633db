"""Document chunking — fixed token windows for training-data pipelines.

Two implementations with identical semantics:

- ``chunks_expr`` — native array expression (transform over a window
  index sequence + slice): whole plan stays JVM-side, one map stage over
  100 TB, no Python. This is the production path.
- ``ChunkDocuments`` — the same logic as a Python UDTF
  (``spark.udtf.register``): the documented extension point for
  row-expanding logic that genuinely can't be expressed as array
  expressions (sentence segmenters, real tokenizers). Tested equal to
  the native path; swap the body, keep the table-function shape.

Chunk semantics: whitespace tokens, lowercased; non-overlapping windows
of ``size`` tokens (a trailing short window is kept); empty/blank docs
produce no chunks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CHUNK_SIZE = 32


def tokens_expr(text: Column | str) -> Column:
    # filter, don't trim: Spark trim() strips only 0x20, so "0\n" would
    # leave a trailing empty token after the \s+ split (caught by the
    # hypothesis cross-check); filtering empties handles every
    # leading/trailing whitespace class identically to the Python twin
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")


def chunks_expr(tokens: Column, size: int = CHUNK_SIZE) -> Column:
    """array<struct<chunk_idx int, n_tokens int, chunk_text string>> —
    window w covers tokens [w·size+1, (w+1)·size] (1-based slice)."""
    n = F.size(tokens)
    n_chunks = F.ceil(n / F.lit(size)).cast("int")
    mk = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda w: F.struct(
            w.cast("int").alias("chunk_idx"),
            F.least(n - w * size, F.lit(size)).cast("int").alias("n_tokens"),
            F.concat_ws(" ", F.slice(tokens, w * size + 1, size)).alias("chunk_text"),
        ),
    )
    # blank/NULL text → empty token array → no chunks, like the UDTF twin
    return F.when(n > 0, mk).otherwise(
        F.array().cast("array<struct<chunk_idx:int,n_tokens:int,chunk_text:string>>")
    )


class ChunkDocuments:
    """Python UDTF twin: ``SELECT * FROM chunk_documents(id, text)``.

    Register with::

        from pyspark.sql.functions import udtf
        spark.udtf.register("chunk_documents",
                            udtf(ChunkDocuments,
                                 returnType="doc_id bigint, chunk_idx int, "
                                            "n_tokens int, chunk_text string"))
    """

    def eval(self, doc_id, text):  # noqa: D102 — UDTF contract method
        import re

        if text is None:
            return
        toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
        for w in range(0, len(toks), CHUNK_SIZE):
            window = toks[w : w + CHUNK_SIZE]
            yield doc_id, w // CHUNK_SIZE, len(window), " ".join(window)
