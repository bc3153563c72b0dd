"""Distributed BPE tokenizer merge training (Sennrich et al. 2016).

The training loop every tokenizer pipeline runs, expressed as pure
DataFrame relational algebra — no driver-side loop over symbols, no
Python in the hot path, and (unlike the float-bearing LM/graph planes)
every quantity is an integer or a string, so the learned merge table is
HASH-EXACT against the DuckDB oracle with zero rounding slack.

Shape per merge rank:
  1. adjacent-pair counts: one ``lead`` window over the (word, pos,
     sym) state + one weighted groupBy — the state is keyed by word, so
     both reuse a single hash partitioning on ``wid``;
  2. argmax pair with a deterministic tie-break (count desc, then
     lexicographic) — a 1-row frame cross-joined back, never a literal
     collected to the driver;
  3. greedy left-to-right apply: candidate starts are (sym, next) ==
     (left, right); overlapping starts only exist when left == right,
     and greedy keeps the even offsets within each consecutive run
     (the run-length parity trick — pos minus row_number is constant
     within a run). Merged-away followers drop via a lag on the kept
     flag; positions re-densify with one row_number.

State is (unique word, freq) exploded to symbols — corpus scale affects
only the ONE word-count shuffle up front; the loop runs over the
vocabulary, which grows sub-linearly with corpus size. Each step ends
in a ``localCheckpoint`` (the same constant-depth-plan discipline as
pagerank/hits — the state is consumed several times per step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

END_MARK = "</w>"


def _word_symbols(words: DataFrame) -> DataFrame:
    """(wid, freq, pos, sym): each unique word split into single-char
    symbols plus the end-of-word marker."""
    chars = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("wid")),
            lambda i: F.col("wid").substr(i, F.lit(1)),
        ),
        F.array(F.lit(END_MARK)),
    )
    return words.select(
        "wid", "freq", F.posexplode(chars).alias("p0", "sym")
    ).select("wid", "freq", (F.col("p0") + 1).alias("pos"), "sym")


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    return_state: bool = False,
):
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table (rank, left, right, merged, pair_count) — the artifact a
    tokenizer ships. pair_count is the weighted adjacent-pair frequency
    that won rank's argmax. With ``return_state`` True, returns
    (merges, state) where state is the final per-word segmentation
    (wid, freq, pos, sym) — the lookup table that tokenizes the corpus
    by a plain join on word."""
    from spacetime_crawler4_spark.operators.dedup import sql_tokens

    words = (
        docs.select(F.explode(sql_tokens(F.col(text_col))).alias("wid"))
        .groupBy("wid")
        .agg(F.count("*").alias("freq"))
    )
    state = _word_symbols(words).localCheckpoint(eager=True)
    out = None
    wwin = Window.partitionBy("wid").orderBy("pos")
    for rank in range(1, n_merges + 1):
        nxt = state.withColumn("nxt", F.lead("sym").over(wwin))
        pairs = (
            nxt.filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("freq").alias("pair_count"))
        )
        best = (
            pairs.orderBy(F.desc("pair_count"), "sym", "nxt")
            .limit(1)
            .select(
                F.lit(rank).alias("rank"),
                F.col("sym").alias("left"),
                F.col("nxt").alias("right"),
                F.concat("sym", "nxt").alias("merged"),
                "pair_count",
            )
            .localCheckpoint(eager=True)
        )
        if best.isEmpty():
            # vocabulary exhausted before n_merges rounds (tiny corpus /
            # every word fully merged): stop with the merges learned so
            # far — continuing would crossJoin an empty `best` and
            # silently empty `state` for every later rank
            break
        out = best if out is None else out.unionByName(best)
        # ---- greedy apply ----
        st = nxt.crossJoin(
            F.broadcast(best.select("left", "right", "merged"))
        ).withColumn(
            "cand",
            (F.col("sym") == F.col("left")) & (F.col("nxt") == F.col("right")),
        )
        cwin = Window.partitionBy("wid", "grp").orderBy("pos")
        cand_runs = (
            st.filter("cand")
            .withColumn("rn", F.row_number().over(wwin))
            .withColumn("grp", F.col("pos") - F.col("rn"))
            .withColumn(
                "keep",
                ((F.col("pos") - F.min("pos").over(cwin)) % 2) == 0,
            )
            .filter("keep")
            .select("wid", "pos", F.lit(True).alias("merge_here"))
        )
        applied = (
            st.join(cand_runs, ["wid", "pos"], "left")
            .withColumn(
                "drop_me",
                F.lag(F.coalesce("merge_here", F.lit(False))).over(wwin),
            )
            .filter(~F.coalesce("drop_me", F.lit(False)))
            .select(
                "wid",
                "freq",
                "pos",
                F.when(F.coalesce("merge_here", F.lit(False)), F.col("merged"))
                .otherwise(F.col("sym"))
                .alias("sym"),
            )
        )
        state = (
            applied.select(
                "wid",
                "freq",
                F.row_number().over(wwin).alias("pos"),
                "sym",
            )
            .localCheckpoint(eager=True)
        )
    if out is None:
        # empty corpus: no adjacent pairs at all — empty merge table
        spark = docs.sparkSession
        out = spark.createDataFrame(
            [], "rank int, left string, right string, merged string, pair_count bigint"
        )
    merges = out.orderBy("rank")
    if return_state:
        return merges, state
    return merges


def bpe_tokens_per_doc(
    docs: DataFrame,
    n_merges: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply the trained segmentation back to the corpus: per document,
    whitespace-word count vs BPE-token count and the tokens-per-word
    ratio (the fertility number tokenizer work tracks). Tokenizing is a
    JOIN — doc words against the (word -> n_symbols) lookup the trainer
    already built — so the corpus-side cost is one explode + one hash
    join, independent of the merge count."""
    from spacetime_crawler4_spark.operators.dedup import sql_tokens

    _, state = bpe_train(docs, n_merges, id_col, text_col, return_state=True)
    seg_len = state.groupBy("wid").agg(F.count("*").alias("n_sym"))
    words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(sql_tokens(F.col(text_col))).alias("wid"),
    )
    return (
        words.join(seg_len, "wid")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
        .select(
            "id",
            "n_words",
            "n_bpe_tokens",
            F.round(F.col("n_bpe_tokens") / F.col("n_words"), 6).alias(
                "tokens_per_word"
            ),
        )
    )
