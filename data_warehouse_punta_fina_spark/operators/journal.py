"""Row-expanding journal-entry generation (reference SURVEY.md §2.9).

The reference iterates order rows and appends 3-5 double-entry accounting
rows per order (`complete_fact_builder.py:768-876`, its largest single
transform). Spark-first: build an array<struct> of candidate entries with
``when`` guards and ``explode`` it — pure codegen, no Python in the loop,
scales as a map over the fact partitions (no shuffle at all).

Account codes (reference `complete_fact_builder.py:737-741`, FIXTURES.md):
1102 Bancos · 1103 Inventario · 2102 IVA por Pagar · 4101 Ventas ·
5101 Costo de Ventas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CTA_BANCOS = 1102
CTA_INVENTARIO = 1103
CTA_IVA = 2102
CTA_VENTAS = 4101
CTA_COSTO = 5101

COST_RATIO = 0.4  # reference books COGS at 40% of net sales (`complete_fact_builder.py:840-858`)


def _entry(cuenta: int, tipo: str, monto: Column, descripcion: str) -> Column:
    return F.struct(
        F.lit(cuenta).alias("cuenta_id"),
        F.lit(tipo).alias("tipo_movimiento"),
        monto.cast("decimal(15,2)").alias("monto"),
        F.lit(descripcion).alias("descripcion"),
    )


def explode_journal_entries(
    orders: DataFrame,
    total_col: str = "total",
    subtotal_col: str = "subtotal",
    iva_col: str = "iva",
    costo_col: str = "costo",
) -> DataFrame:
    """Emit the double-entry rows for each order-level sales row.

    Per order: debit Bancos=total; credit Ventas=subtotal; credit IVA (if
    >0); debit Costo de Ventas (if >0); credit Inventario (same). The
    Σdébitos = Σcréditos invariant holds iff total = subtotal + iva
    (reference asserts it within $0.01, `complete_fact_builder.py:973-980`).
    """
    entries = F.array(
        _entry(CTA_BANCOS, "DEBITO", F.col(total_col), "Cobro de venta"),
        _entry(CTA_VENTAS, "CREDITO", F.col(subtotal_col), "Venta de mercadería"),
        _entry(CTA_IVA, "CREDITO", F.col(iva_col), "IVA débito fiscal"),
        _entry(CTA_COSTO, "DEBITO", F.col(costo_col), "Costo de ventas"),
        _entry(CTA_INVENTARIO, "CREDITO", F.col(costo_col), "Salida de inventario"),
    )
    kept = F.filter(entries, lambda e: e["monto"] > 0)
    return (
        orders.withColumn("entry", F.explode(kept))
        .withColumn("cuenta_id", F.col("entry.cuenta_id"))
        .withColumn("tipo_movimiento", F.col("entry.tipo_movimiento"))
        .withColumn("monto", F.col("entry.monto"))
        .withColumn("descripcion", F.col("entry.descripcion"))
        .drop("entry")
    )
