"""Repo wrapper for the packaged parity gate
(nfl_data_engineering_spark/parity.py; also installed as the
``nfl-spark-parity`` console script).

Usage: python tools/parity.py [sf_dir] [query_name ...]
Env:   SPARK_GRAFT_VANILLA=1  -> use a bone-stock SparkSession (driver sim)
"""

from __future__ import annotations

try:
    from nfl_data_engineering_spark.parity import main
except ImportError:  # not pip-installed: tools/ is sys.path[0], not the repo
    import os
    import sys
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nfl_data_engineering_spark.parity import main

if __name__ == "__main__":
    main()
