"""Multinomial Naive Bayes text classifier, trained and scored as pure
relational algebra — the classifier-based quality/language filtering step
of the classic LLM data pipeline (CCNet trains a fastText LID + LM filter;
GPT-3/The Pile gate Common Crawl behind a quality classifier). The
reference crawler has no classifier plane (its language handling is the
stopword list, rsrc/stopwords.txt); this is an additive web-scale
extension, like the rest of the training-data suite.

Train = three aggregations over the token plane:
  - class priors            groupBy(label)            |C| rows
  - class token totals      groupBy(label)            |C| rows
  - word-class counts       groupBy(label, word)      the model

Score = per-doc distinct-word counts cross-joined with the |C|-row class
dim, left-joined against the word-class model, Laplace-smoothed:

  log P(c|d) ∝ ln prior_c + Σ_w n_dw · ln((cnt_cw + 1) / (tot_c + V))

Shuffle shape at 100 TB: the corpus shuffles once for (doc, word) counts;
the model join keys on (word, label) — an ordinary hash join against a
model whose size is vocab × |C| (broadcastable for real label sets); the
argmax is a |C|-wide per-doc window, never a global sort. All arithmetic
is JVM column expressions shared verbatim with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.dedup import sql_tokens

NB_SMOOTH = 1.0  # Laplace add-one


def _doc_word_counts(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    return (
        docs.select(id_col, F.explode(sql_tokens(F.col(text_col))).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("n_dw"))
    )


def nb_scores(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per (doc, label) smoothed log-posterior (unnormalized):
    (id_col, label, score). Trains on ``docs``'s own labels and scores the
    same frame (the in-corpus fit a pipeline audits before applying the
    model to unlabeled data — split-train variants are a filter away).
    Empty-token docs score on priors alone."""
    # dw is consumed three times (model counts, vocab size, scoring grid):
    # materialize the tokenize+count once. On a cluster this is persist()
    # or a staging table; the explode it avoids re-running is the
    # corpus-sized stage.
    dw = _doc_word_counts(docs, id_col, text_col).localCheckpoint(eager=True)
    labeled = dw.join(
        docs.select(id_col, F.col(label_col).alias("label")), id_col
    )
    classes = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs_c")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    wc = labeled.groupBy("label", "word").agg(F.sum("n_dw").alias("cnt"))
    tot = wc.groupBy("label").agg(F.sum("cnt").alias("tot"))
    vocab = dw.agg(F.count_distinct("word").alias("vocab"))

    grid = dw.crossJoin(F.broadcast(classes.select("label")))
    contrib = (
        grid.join(wc, ["label", "word"], "left")
        .withColumn(
            "lp",
            F.col("n_dw")
            * F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(NB_SMOOTH))
            ),
        )
        .groupBy(id_col, "label")
        .agg(F.sum("lp").alias("ll_num"), F.sum("n_dw").alias("n_tok"))
    )
    # denominator ln(tot_c + V) factors out of the per-word sum:
    # Σ n_dw·ln((cnt+1)/(tot_c+V)) = Σ n_dw·ln(cnt+1) − n_tok·ln(tot_c+V)
    priors = (
        classes.join(tot, "label")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            F.log(F.col("n_docs_c") / F.col("n_docs")).alias("log_prior"),
            F.log(F.col("tot") + F.col("vocab") * F.lit(NB_SMOOTH)).alias(
                "log_denom"
            ),
        )
    )
    base = docs.select(id_col).crossJoin(F.broadcast(priors))
    return (
        base.join(contrib, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (
                F.col("log_prior")
                + F.coalesce(F.col("ll_num"), F.lit(0.0))
                - F.coalesce(F.col("n_tok"), F.lit(0)) * F.col("log_denom")
            ).alias("score"),
        )
    )


def nb_classify(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """argmax over nb_scores with a deterministic (score desc, label asc)
    election, plus the top-2 margin — the pipeline's keep/route signal:
    (id_col, pred_label, margin, correct)."""
    scores = nb_scores(docs, label_col, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    ranked = scores.select(
        id_col,
        "label",
        "score",
        F.row_number().over(w).alias("rn"),
        F.lead("score").over(w).alias("runner_up"),
    ).filter(F.col("rn") == 1)
    truth = docs.select(id_col, F.col(label_col).alias("true_label"))
    return ranked.join(truth, id_col).select(
        id_col,
        F.col("label").alias("pred_label"),
        F.round(F.col("score") - F.col("runner_up"), 6).alias("margin"),
        (F.col("label") == F.col("true_label")).cast("int").alias("correct"),
    )


# --------------------------------------------------------------------------
# logistic regression by deterministic full-batch gradient descent
# --------------------------------------------------------------------------

LR_PROB_SCALE = 1_000_000  # sigmoid fixed-point scale: p -> floor(p*1e6 + .5)


def logreg_train_gd(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 4,
    lr: float | list[float] = 0.001,
) -> tuple[list[float], int]:
    """Full-batch gradient-descent logistic regression whose training run
    is bit-reproducible across engines and across cluster re-runs.

    ``feats``: one row per example, INTEGER-valued feature columns (the
    caller scales/centers; integer features are what make the gradient
    exact) and a 0/1 ``label_col``. ``lr`` is a single step size or one
    per weight (bias first) — the deterministic stand-in for feature
    normalization when the integer features have very different scales.
    Returns (weights, n) with weights[0] the bias (implicit x0 = 1)
    followed by one weight per feature column.

    Why this is the 100-TB shape (and why it is deterministic when
    ``df.rdd``-based SGD is not):

    - each iteration is ONE map-side-combined aggregation over the
      corpus producing d+1 numbers — no shuffle beyond the final
      partial-merge, no per-row Python, no parameter server;
    - the driver holds only the (d+1)-float weight vector between
      iterations (same bounded-driver contract as the IVF codebooks in
      operators/similarity.py);
    - float summation order varies with partitioning, so the gradient is
      summed in INTEGER space instead: the sigmoid is quantized to
      p6 = floor(1e6·σ(z) + 0.5) and grad_j = Σ (p6 − 1e6·y)·x_j is an
      exact BIGINT — identical under any partitioning, any task retry,
      and in the DuckDB oracle. The only cross-engine wobble left is a
      last-ulp exp() difference landing exactly on a 0.5e-6 quantization
      boundary (probability ~1e-10 per row; the round-3 ppx queries
      carry the same documented exposure).
    - weight updates happen in IEEE double with a FIXED expression shape
      (w − (lr·g)/(n·1e6), left-associative), so Python, the JVM, and
      DuckDB compute bit-identical weights from identical gradients.
    """
    n = feats.count()
    if n == 0:
        return [0.0] * (len(feature_cols) + 1), 0
    w = [0.0] * (len(feature_cols) + 1)
    lrs = list(lr) if isinstance(lr, (list, tuple)) else [lr] * len(w)
    if len(lrs) != len(w):
        raise ValueError(f"lr needs 1 or {len(w)} entries, got {len(lrs)}")
    y6 = (F.col(label_col).cast("long") * F.lit(LR_PROB_SCALE)).alias("_y6")
    for _ in range(iterations):
        z = F.lit(w[0])
        for j, c in enumerate(feature_cols):
            z = z + F.lit(w[j + 1]) * F.col(c)
        p6 = F.floor(
            F.lit(float(LR_PROB_SCALE)) / (F.lit(1.0) + F.exp(-z)) + F.lit(0.5)
        ).cast("long")
        proj = feats.select((p6 - y6).alias("_d"), *feature_cols)
        row = proj.agg(
            F.sum("_d").alias("g0"),
            *[
                F.sum(F.col("_d") * F.col(c)).alias(f"g{j + 1}")
                for j, c in enumerate(feature_cols)
            ],
        ).collect()[0]
        w = [
            w[j] - (lrs[j] * float(row[f"g{j}"])) / (n * float(LR_PROB_SCALE))
            for j in range(len(w))
        ]
    return w, n


def logreg_decision_col(w: list[float], feature_cols: list[str]):
    """The fitted decision value z = w·[1, x...] as a column expression
    (left-associative, mirroring the training expression exactly)."""
    z = F.lit(w[0])
    for j, c in enumerate(feature_cols):
        z = z + F.lit(w[j + 1]) * F.col(c)
    return z
