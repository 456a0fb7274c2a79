from data_warehouse_punta_fina_spark.streaming.file_stream import (  # noqa: F401
    read_file_stream,
    run_available_now,
    tumbling_window_agg,
)
