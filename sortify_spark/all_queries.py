"""Import every query module so REGISTRY is fully populated.

``__spark_entry__`` (the driver contract) and ``bench.py`` import this
module; adding a new query module means adding one import here.
"""

from sortify_spark.queries import REGISTRY  # noqa: F401 — core relational
import sortify_spark.queries_text  # noqa: F401, E402
import sortify_spark.queries_vector  # noqa: F401, E402
import sortify_spark.queries_metrics  # noqa: F401, E402
import sortify_spark.queries_clustering  # noqa: F401, E402
import sortify_spark.queries_pipeline  # noqa: F401, E402
import sortify_spark.queries_sources  # noqa: F401, E402
import sortify_spark.queries_extras  # noqa: F401, E402
import sortify_spark.queries_detail  # noqa: F401, E402
import sortify_spark.queries_scale  # noqa: F401, E402
import sortify_spark.queries_skew  # noqa: F401, E402
import sortify_spark.queries_dedup  # noqa: F401, E402
