"""Pipeline orchestration (reference SURVEY.md §3.1; `main.py:94-154`).

dims → facts, with the staged financial chain materialized once:
the reference writes fact_transacciones to the DW and reads it back for
fact_balance / fact_estado_resultados (`complete_fact_builder.py:918-932`);
here the journal is cached (or persisted to ``warehouse_dir``) and fed
forward — one computation, two consumers.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_punta_fina_spark.plans.dims import (
    build_dim_almacen,
    build_dim_cliente,
    build_dim_cuenta_contable,
    build_dim_fecha,
    build_dim_producto,
    build_dim_promocion,
    build_dim_proveedor,
    build_dim_usuario,
)
from data_warehouse_punta_fina_spark.plans.facts import (
    build_fact_balance,
    build_fact_estado_resultados,
    build_fact_inventario,
    build_fact_transacciones,
    build_fact_ventas,
)
from data_warehouse_punta_fina_spark.sources.writers import write_parquet


@dataclass
class PipelineResult:
    tables: dict[str, DataFrame]
    counts: dict[str, int] = field(default_factory=dict)
    seconds: float = 0.0


def run_star_build(
    spark: SparkSession,
    sf_dir: str,
    warehouse_dir: str | None = None,
    count: bool = True,
) -> PipelineResult:
    """Build every dim + fact. If ``warehouse_dir`` is set, each table is
    written as parquet (facts partitioned where it pays off)."""
    t0 = time.time()
    dims: dict[str, DataFrame] = {
        "dim_fecha": build_dim_fecha(spark, sf_dir),
        "dim_producto": build_dim_producto(spark, sf_dir),
        "dim_cliente": build_dim_cliente(spark, sf_dir),
        "dim_usuario": build_dim_usuario(spark, sf_dir),
        "dim_almacen": build_dim_almacen(spark, sf_dir),
        "dim_proveedor": build_dim_proveedor(spark, sf_dir),
        "dim_cuenta_contable": build_dim_cuenta_contable(spark, sf_dir),
        "dim_promocion": build_dim_promocion(spark, sf_dir),
    }

    fact_ventas = build_fact_ventas(
        spark, sf_dir, dims["dim_producto"], dims["dim_cliente"], dims["dim_almacen"]
    )
    fact_inventario = build_fact_inventario(spark, sf_dir)

    journal = build_fact_transacciones(spark, sf_dir)
    # staged self-referential dataflow: materialize once, consume twice
    journal = journal.cache()
    fact_balance = build_fact_balance(journal, dims["dim_cuenta_contable"])
    fact_estado = build_fact_estado_resultados(journal)

    tables = {
        **dims,
        "fact_ventas": fact_ventas,
        "fact_inventario": fact_inventario,
        "fact_transacciones": journal,
        "fact_balance": fact_balance,
        "fact_estado_resultados": fact_estado,
    }

    result = PipelineResult(tables=tables)
    if warehouse_dir:
        for name, df in tables.items():
            write_parquet(df, f"{warehouse_dir}/{name}")
    if count:
        result.counts = {name: df.count() for name, df in tables.items()}
    result.seconds = time.time() - t0
    return result
