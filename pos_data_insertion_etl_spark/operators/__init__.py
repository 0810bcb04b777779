from .fixedwidth import FixedWidthField, fixed_width_record, parse_fixed_width  # noqa: F401
from .combine import combine_records  # noqa: F401
from .retention import retention_filter  # noqa: F401
from .topk import top_k_per_group  # noqa: F401
