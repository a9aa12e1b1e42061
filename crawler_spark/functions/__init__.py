"""Vectorized scalar kernels (JVM built-ins where possible, Arrow pandas
UDFs where Python is unavoidable). Zero per-row Python in any Spark plan:
plans may contain ArrowEvalPython / MapInArrow nodes but never
BatchEvalPython (enforced by tests/test_plan_hygiene.py).
"""

from crawler_spark.functions.urlnorm import (  # noqa: F401
    canonicalize_col,
    host_of,
    resolve_urls_udf,
    url_hash_col,
)
from crawler_spark.functions.dates import (  # noqa: F401
    format_time2_udf,
    parse_pub_time,
)
