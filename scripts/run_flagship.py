"""spark-submit entry point for the flagship pipeline.

Deployment shape (the north rule's `spark-submit --py-files` on a multi-
executor cluster):

    cd /root/repo && zip -r /tmp/ddspark.zip differential_dataflow_spark
    spark-submit --master <cluster> --py-files /tmp/ddspark.zip \
        scripts/run_flagship.py --convs 500000

In the sandbox the master defaults to local[$SPARK_GRAFT_CPUS]; on a real
cluster pass --master spark://... or yarn and the identical code runs —
nothing here assumes local mode.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=100_000)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from differential_dataflow_spark.flagship import flagship_pipeline
    from differential_dataflow_spark.session import get_spark

    spark = get_spark(app_name="flagship", cores=args.cores)
    stats = flagship_pipeline(spark, n_convs=args.convs)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
