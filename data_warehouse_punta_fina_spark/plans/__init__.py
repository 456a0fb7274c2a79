from data_warehouse_punta_fina_spark.plans.dims import (  # noqa: F401
    build_dim_almacen,
    build_dim_cliente,
    build_dim_cuenta_contable,
    build_dim_fecha,
    build_dim_producto,
    build_dim_promocion,
    build_dim_proveedor,
    build_dim_usuario,
)
from data_warehouse_punta_fina_spark.plans.facts import (  # noqa: F401
    build_fact_balance,
    build_fact_estado_resultados,
    build_fact_inventario,
    build_fact_transacciones,
    build_fact_ventas,
)
from data_warehouse_punta_fina_spark.plans.pipeline import PipelineResult, run_star_build  # noqa: F401
