from .marts import (  # noqa: F401
    R520_FIELDS,
    customer_count_mart,
    daily_sales_mart,
    run_pos_pipeline,
    sales_front_mart,
    sku_merge,
    sku_temp,
)
