"""Pre-warming Python worker daemon (set via
``spark.python.daemon.module=osm_addr_tools_spark.daemon_prewarm``).

PySpark forks a worker process per task slot from the daemon; by default
each forked worker then imports pandas/pyarrow/numpy and the UDF's module
graph from scratch (~1.5–2 s each). Under concurrent Arrow stages the pool
doubles and a 32-core box can spend a minute in import storms (measured:
"time to initialize Python workers" 40–58 s per stage at local[32]).

Importing the heavy modules HERE — in the daemon, before ``manager()``
starts forking — lets every forked worker inherit them via copy-on-write:
worker init drops to ~0. This is plain public PySpark mechanics
(``spark.python.daemon.module`` is a documented escape hatch).
"""

# heavy third-party stack first
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

# worker-side pyspark modules the first UDF call would pull in
import pyspark.sql.pandas.serializers  # noqa: F401
import pyspark.sql.pandas.types  # noqa: F401
import pyspark.worker  # noqa: F401

# engine kernels referenced by UDF closures
import osm_addr_tools_spark.functions.cells  # noqa: F401
import osm_addr_tools_spark.functions.geo  # noqa: F401
import osm_addr_tools_spark.functions.normalize  # noqa: F401
import osm_addr_tools_spark.functions.text  # noqa: F401
import osm_addr_tools_spark.sources.synth  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
