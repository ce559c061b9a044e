"""BPE tokenizer merge learning (Sennrich et al. 2016) in the engine.

Training-data stacks fit their tokenizer on the corpus they curate;
the core of BPE training is iterative: count adjacent symbol pairs
over the (word-type, frequency) table, take the most frequent pair,
merge it everywhere, repeat. This module runs those rounds as
Catalyst plans — the merge table (the tokenizer artifact) is the
output.

Spark-first shape (100 TB design)
---------------------------------
- BPE never touches the corpus after one pass: training operates on
  the *word-type* table ``(word, n)`` (vocabulary-sized, the classic
  trick), built with one corpus aggregate. Every round is then one
  explode+aggregate over the vocabulary (pair counts, map-side
  combined, weighted by ``n``) and one projection (the merge).
- The winning pair is a TakeOrdered(1) broadcast-crossed back into
  the vocabulary — the merge itself never leaves the cluster and no
  driver round-trip is needed; the word table localCheckpoints per
  round (the iterative-loop lineage rule, ops/graph.py).

Cross-engine determinism
------------------------
Everything is integer counts and string manipulation — no floats
anywhere. The greedy left-to-right merge folds each word's symbol
sequence with a STRING accumulator (the ``\\x1f``-joined symbols so
far): merging appends ``b`` to an accumulator ending in ``sep+a``,
otherwise appends ``sep+s``. A string accumulator (not an array one)
is deliberate: DuckDB's ``list_reduce`` requires accumulator and
element types to match, and with string elements the joined-string
accumulator satisfies that — so the oracle replays the exact greedy
semantics, including chained merges ('aaaa' + (a,a) -> aa aa).
Symbols can never contain the separator (it is stripped from input),
and a merged symbol always ends with ``b`` (non-empty), so a merge
can never fabricate a fresh ``sep+a`` suffix — no false chains.
Ties in pair counts break on (count desc, left, right).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nhs_data_pipeline_spark.llm.text import explode_terms

#: Symbol separator inside the fold accumulator (unit separator).
SEP = "\x1f"

#: Greedy left-to-right merge of pair (__a, __b) over the symbol
#: string __syms of each word; __a/__b come from the crossed-in
#: winning-pair row. ``endswith(acc, sep || __a)`` is exact
#: last-symbol equality because symbols cannot contain the separator.
_MERGE = (
    "aggregate(split(substr(__syms, 2), chr(31)), '', "
    "(__acc, __s) -> CASE WHEN __acc <> '' "
    "AND endswith(__acc, chr(31) || __a) AND __s = __b "
    "THEN __acc || __s ELSE __acc || chr(31) || __s END)"
)


def word_type_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, n): whitespace word types with corpus frequencies — the
    one corpus-sized pass; everything after runs on the vocabulary.
    The fold separator is stripped defensively."""
    return (
        explode_terms(df, text_col, id_col)
        .select(F.regexp_replace("term", SEP, "").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(__syms, n): each word as its sep-joined character sequence
    (leading separator), via position probes — identical in any
    engine (character split functions disagree about empty edges)."""
    return words.select(
        F.expr(
            "aggregate(transform(sequence(1, length(word)), "
            "__i -> substring(word, __i, 1)), '', "
            "(__acc, __c) -> __acc || chr(31) || __c)"
        ).alias("__syms"),
        "n",
    )


def bpe_merges(
    df: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from the corpus:
    ``(it, left, right, pair_count)`` with ``it`` starting at 1.

    Each round: explode adjacent symbol pairs weighted by word
    frequency, pick the (count desc, left, right) winner, merge it
    greedily left-to-right in every word, continue on the merged
    vocabulary. Returns ``(it, left_sym, right_sym, pair_count)``.
    If the vocabulary runs out of pairs before ``n_merges`` rounds,
    the loop stops and returns the merges learned so far (an empty
    winner crossJoined into the state would otherwise silently empty
    the vocabulary)."""
    state = _initial_symbols(word_type_table(df, text_col, id_col))
    merges = None
    for it in range(1, n_merges + 1):
        pairs = (
            state.select(
                "n", F.expr("split(substr(__syms, 2), chr(31))").alias("__w")
            )
            .select(
                "n",
                F.explode(
                    F.expr(
                        "CASE WHEN size(__w) > 1 "
                        "THEN transform(sequence(1, size(__w) - 1), "
                        "__j -> struct(element_at(__w, __j) AS l, "
                        "element_at(__w, __j + 1) AS r)) "
                        "ELSE cast(array() as array<struct<l: string, r: string>>) END"
                    )
                ).alias("__p"),
            )
            .groupBy(F.col("__p.l").alias("__a"), F.col("__p.r").alias("__b"))
            .agg(F.sum("n").alias("pair_count"))
        )
        top1 = pairs.orderBy(
            F.desc("pair_count"), F.asc("__a"), F.asc("__b")
        ).limit(1).localCheckpoint()  # 1 row, eager: reused 3x below
        if not top1.take(1):
            # Vocabulary exhausted (every word is a single symbol): an
            # empty winner crossJoined into the state would silently
            # annihilate the whole vocabulary and truncate the merge
            # table without error (review finding). Stop with the
            # merges learned so far instead.
            break
        step = top1.select(
            F.lit(it).alias("it"),
            # not "left"/"right": SQL reserved words complicate oracles
            F.col("__a").alias("left_sym"),
            F.col("__b").alias("right_sym"),
            "pair_count",
        )
        merges = step if merges is None else merges.unionByName(step)
        state = (
            state.crossJoin(F.broadcast(top1.select("__a", "__b")))
            .select(F.expr(_MERGE).alias("__syms"), "n")
            # vocabulary-sized; truncate the per-round plan
            .localCheckpoint(eager=False)
        )
        state.count()
    if merges is None:  # no pairs at all (every word single-symbol)
        return df.sparkSession.createDataFrame(
            [], "it int, left_sym string, right_sym string, pair_count bigint"
        )
    return merges
