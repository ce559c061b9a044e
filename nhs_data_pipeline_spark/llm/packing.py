"""Sequence packing: assemble documents into fixed token-budget
training sequences (the concat-and-chunk layout used for LLM
pretraining shards).

The packing itself is a layout DECISION, not a data move: given
per-document token counts, assign every document its position in the
packed token stream — which sequence it starts in, at what offset, and
how many sequences it spans. Downstream writers then emit shards from
the assignment without any global coordination.

Scale design: packing is per-SHARD (``shard_col``), so the cumulative
sum window partitions by shard — there is no global single-partition
window; shards are independent streams packed in parallel, exactly how
multi-worker pretraining data is laid out. Determinism comes from the
explicit ``order_col`` within each shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_contiguous(
    df: DataFrame,
    token_col: str,
    budget: int,
    shard_col: str,
    order_col: str,
) -> DataFrame:
    """Concat-and-chunk assignment: within each shard, documents are
    laid end-to-end in ``order_col`` order and the stream is cut into
    ``budget``-token sequences. Adds:

    - ``tok_start`` / ``tok_end``: the doc's [start, end) token span in
      the shard stream;
    - ``seq_first`` / ``seq_last``: first/last sequence index touched;
    - ``n_seqs``: sequences this document spans (crossing docs are the
      ones a loader must split or mask across boundaries).
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(token_col).cast("long")
    out = (
        df.withColumn("tok_end", F.sum(toks).over(w))
        .withColumn("tok_start", F.col("tok_end") - toks)
        .withColumn("seq_first", F.floor(F.col("tok_start") / budget))
        .withColumn(
            "seq_last",
            F.when(toks == 0, F.floor(F.col("tok_start") / budget)).otherwise(
                F.floor((F.col("tok_end") - 1) / budget)
            ),
        )
        .withColumn("n_seqs", F.col("seq_last") - F.col("seq_first") + 1)
    )
    return out


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 40,
    overlap: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping fixed-token chunks
    (retrieval/context windows: stride = chunk_tokens - overlap, last
    chunk may run short; an empty document yields one empty chunk so
    no document silently disappears).

    Scale: pure row-local expressions — tokenize once, explode the
    chunk-start sequence, slice. No shuffle at all; chunking runs
    inside the scan stage and the output is ready to repartition by
    whatever key the downstream embed/index step shards on."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "),
        lambda t: t != "",
    )
    out = df.select(
        F.col(id_col),
        toks.alias("__toks"),
    ).select(
        id_col,
        F.posexplode(
            F.expr(f"sequence(0, greatest(size(__toks) - 1, 0), {stride})")
        ).alias("chunk_id", "__start"),
        "__toks",
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return out.select(
        id_col,
        "chunk_id",
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).alias("n_chunk_tokens"),
    )
