"""Driver entry point: delegate to the packaged bench harness
(nfl_data_engineering_spark/bench.py; also installed as the
``nfl-spark-bench`` console script). Prints ONE JSON line — see the
package module's docstring for the contract."""

from __future__ import annotations

try:
    from nfl_data_engineering_spark.bench import main
except ImportError:  # not pip-installed and invoked from another cwd
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from nfl_data_engineering_spark.bench import main

if __name__ == "__main__":
    main()
