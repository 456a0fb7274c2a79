"""Fellegi-Sunter record linkage (operators/linkage.py)."""

from __future__ import annotations

import math


def test_fellegi_sunter_scores_and_verdicts(spark):
    from data_warehouse_punta_fina_spark.operators.linkage import (
        FieldCompare,
        fellegi_sunter_link,
    )

    a = spark.createDataFrame(
        [(1, "ann", 100.0, "X"), (2, "bob", 200.0, "X"), (3, "cyd", 300.0, "Y")],
        "ida long, name string, bal double, blk string",
    )
    b = spark.createDataFrame(
        [(10, "ann", 101.0, "X"), (20, "rob", 205.0, "X"), (30, "cyd", 900.0, "Y")],
        "idb long, name string, bal double, blk string",
    )
    fields = [
        FieldCompare("name", "name", "name", m=0.9, u=0.01, kind="levenshtein", tol=1.0),
        FieldCompare("bal", "bal", "bal", m=0.8, u=0.05, kind="abs_diff", tol=5.0),
    ]
    out = fellegi_sunter_link(
        a, b, "ida", "idb", ["blk"], ["blk"], fields, match_threshold=6.0, review_threshold=0.0
    )
    rows = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    # blocking: only same-blk pairs exist (2×2 in X, 1×1 in Y)
    assert set(rows) == {(1, 10), (1, 20), (2, 10), (2, 20), (3, 30)}

    w_name = (math.floor(math.log(0.9 / 0.01) * 1e6 + 0.5) / 1e6,
              math.floor(math.log(0.1 / 0.99) * 1e6 + 0.5) / 1e6)
    w_bal = (math.floor(math.log(0.8 / 0.05) * 1e6 + 0.5) / 1e6,
             math.floor(math.log(0.2 / 0.95) * 1e6 + 0.5) / 1e6)

    # (1,10): both agree → full match
    r = rows[(1, 10)]
    assert r["agree_name"] and r["agree_bal"]
    assert r["score"] == 0.0 + w_name[0] + w_bal[0]
    assert r["verdict"] == "match"
    # (2,20): name 'bob'→'rob' lev 1 agrees, bal |200−205|≤5 agrees → match
    assert rows[(2, 20)]["verdict"] == "match"
    # (3,30): name agrees, bal wildly off → review band (score between 0 and 6)
    r = rows[(3, 30)]
    assert r["agree_name"] and not r["agree_bal"]
    assert r["score"] == 0.0 + w_name[0] + w_bal[1]
    assert r["verdict"] == "review"
    # (1,20): nothing agrees → non_match
    assert rows[(1, 20)]["verdict"] == "non_match"


def test_fellegi_sunter_nulls_count_as_disagreement(spark):
    from data_warehouse_punta_fina_spark.operators.linkage import (
        FieldCompare,
        fellegi_sunter_link,
    )

    a = spark.createDataFrame([(1, None, "X")], "ida long, name string, blk string")
    b = spark.createDataFrame([(10, "ann", "X")], "idb long, name string, blk string")
    fields = [FieldCompare("name", "name", "name", m=0.9, u=0.01)]
    r = fellegi_sunter_link(
        a, b, "ida", "idb", ["blk"], ["blk"], fields, match_threshold=1.0
    ).collect()[0]
    assert r["agree_name"] is False and r["verdict"] == "non_match"
