"""Scalar-function layer tests (SURVEY.md §2.8)."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F


def test_date_keys_and_spanish_calendar(spark):
    from data_warehouse_punta_fina_spark.functions.dates import (
        date_key,
        is_weekend,
        iso_dow,
        period_key,
        period_of_date_key,
        spanish_day_name,
        spanish_month_name,
    )

    # 2024-01-01 is a Monday
    df = spark.createDataFrame([(datetime.date(2024, 1, 1),), (datetime.date(2024, 1, 6),)], "d date")
    out = df.select(
        date_key("d").alias("k"),
        period_key("d").alias("p"),
        iso_dow("d").alias("dow"),
        spanish_day_name("d").alias("dn"),
        spanish_month_name("d").alias("mn"),
        is_weekend("d").alias("we"),
    ).collect()
    assert out[0]["k"] == 20240101 and out[0]["p"] == 202401
    assert out[0]["dow"] == 1 and out[0]["dn"] == "Lunes" and out[0]["mn"] == "Enero"
    assert not out[0]["we"]
    assert out[1]["dow"] == 6 and out[1]["dn"] == "Sábado" and out[1]["we"]

    pk = spark.createDataFrame([(20240115,)], "fecha_id int").select(
        period_of_date_key("fecha_id").alias("p")
    ).collect()[0]["p"]
    assert pk == 202401


def test_portable_rounding_half_up(spark):
    from data_warehouse_punta_fina_spark.functions.money import pround2

    import math

    vals = [2.675, 1.005, 0.125, 10.994]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = [r["r"] for r in df.select(pround2("x").alias("r")).collect()]
    # deterministic floor(x*100+0.5) on the binary double — must equal the
    # same IEEE computation in plain Python (and any other engine)
    want = [Decimal(str(math.floor(v * 100 + 0.5) / 100)).quantize(Decimal("0.01")) for v in vals]
    assert out == want


def test_extract_iva_splits_13_percent(spark):
    from data_warehouse_punta_fina_spark.functions.money import extract_iva, money

    df = spark.createDataFrame([(Decimal("113.00"),)], "incl decimal(15,2)")
    sub, iva = extract_iva("incl")
    r = df.select(sub.alias("s"), iva.alias("i")).collect()[0]
    assert r["s"] == Decimal("100.00") and r["i"] == Decimal("13.00")
    assert df.select(money(F.lit(1.5)).alias("m")).collect()[0]["m"] == Decimal("1.50")


def test_string_helpers(spark):
    from data_warehouse_punta_fina_spark.functions.strings import (
        auto_id,
        coded_id,
        contains_ci,
        extract_int,
        first_token,
        full_name,
        name_or_default,
        truthy_bool,
    )

    df = spark.createDataFrame(
        [(42, "  ", "ENV005 fast", "Brand#13 x", "TRUE", "Ana", "Paz", "apaz")],
        "id int, blank string, env string, brand string, flag string, fn string, ln string, user string",
    )
    r = df.select(
        coded_id("CLI-", "id", 6).alias("code"),
        name_or_default("blank", "Producto ", "id").alias("name"),
        extract_int("env").alias("num"),
        first_token("brand").alias("tok"),
        contains_ci("env", "ENV").alias("ci"),
        truthy_bool("flag").alias("tb"),
        full_name("fn", "ln", "user").alias("full"),
        auto_id("id", "env").alias("aid"),
    ).collect()[0]
    assert r["code"] == "CLI-000042"
    assert r["name"] == "Producto 42"
    assert r["num"] == 5
    assert r["tok"] == "Brand#13"
    assert r["ci"] and r["tb"]
    assert r["full"] == "Ana Paz"
    assert len(r["aid"]) == 8

    # null first/last → fallback
    df2 = spark.createDataFrame([(None, None, "fallback")], "fn string, ln string, user string")
    assert df2.select(full_name("fn", "ln", "user").alias("f")).collect()[0]["f"] == "fallback"


def test_text_functions(spark):
    from data_warehouse_punta_fina_spark.functions.text import (
        fingerprint,
        lang_id,
        quality_score,
        token_count,
        tokens,
        word_shingles,
    )

    df = spark.createDataFrame(
        [("The quick, brown fox!",), ("el perro de la casa que ladra y come",), ("",)],
        "text string",
    )
    rows = df.select(
        tokens("text").alias("t"),
        token_count("text").alias("n"),
        lang_id("text").alias("lang"),
        word_shingles("text", 2).alias("sh"),
        fingerprint("text").alias("fp"),
        quality_score("text").alias("q"),
    ).collect()
    assert rows[0]["t"] == ["the", "quick", "brown", "fox"]
    assert rows[0]["n"] == 4
    assert rows[0]["lang"] == "en"
    assert "the quick" in rows[0]["sh"]
    assert rows[1]["lang"] == "es"
    assert rows[2]["n"] == 0 and rows[2]["lang"] == "und"
    # rolling hash: deterministic value for 'ab' = (0*31+97)*31+98
    df_ab = spark.createDataFrame([("ab",)], "text string")
    assert df_ab.select(fingerprint("text").alias("f")).collect()[0]["f"] == 97 * 31 + 98
    assert rows[0]["q"] is not None


def test_vector_quantized_cosine(spark):
    from data_warehouse_punta_fina_spark.functions.vectors import cosine_q, quantize

    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.5, 0.5], [0.5, 0.5])],
        "a array<float>, b array<float>",
    )
    out = [
        r["c"]
        for r in df.select(cosine_q(quantize("a"), quantize("b")).alias("c")).collect()
    ]
    assert out[0] == Decimal("1.000000")
    assert out[1] == Decimal("0.000000")
    assert out[2] == Decimal("1.000000")
