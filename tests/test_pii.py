"""PII scrub: detector correctness on constructed text, redaction order,
map-only plan guarantee."""

from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.pii import (
    inject_pii,
    pii_redact,
    pii_report,
)


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "mail a.user+tag@sub.example.co.uk now, host 192.168.1.254 "
                "call +44-201-555-0199 card 4111222233334444 done",
            ),
            (2, "no pii in this row at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r.id: r for r in pii_report(df, "doc_id", "text").collect()}
    r1 = rows[1]
    assert (r1.n_email, r1.n_ipv4, r1.n_phone, r1.n_longnum) == (1, 1, 1, 1)
    assert r1.n_pii == 4
    r2 = rows[2]
    assert r2.n_pii == 0

    red = df.select(pii_redact(F.col("text")).alias("t")).collect()
    texts = [r.t for r in red]
    assert (
        "mail <EMAIL> now, host <IP> call <PHONE> card <NUM> done" in texts
    )
    assert "no pii in this row at all" in texts


def test_pii_redaction_order_email_digits_not_numbered(spark):
    # the email local part contains a 13-digit run: EMAIL must win
    # (applied first), leaving no <NUM> inside the replacement
    df = spark.createDataFrame(
        [(1, "x 1234567890123@example.org y")], "doc_id long, text string"
    )
    out = df.select(pii_redact(F.col("text")).alias("t")).collect()[0].t
    assert out == "x <EMAIL> y"


def test_pii_injection_deterministic_and_detected(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rep = pii_report(inject_pii(docs, "doc_id", "text"), "doc_id", "text")
    agg = rep.agg(
        F.min("n_email"), F.min("n_ipv4"),
        F.sum((F.col("n_phone") > 0).cast("int")),
        F.sum((F.col("n_longnum") > 0).cast("int")),
        F.count("*"),
    ).collect()[0]
    # every doc gets exactly one email + one ip; phones on id%3==0,
    # card numbers on id%4==0
    assert agg[0] == 1 and agg[1] == 1
    assert agg[2] == (agg[4] + 2) // 3
    assert agg[3] == (agg[4] + 3) // 4


def test_pii_report_is_map_only(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = (
        pii_report(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
