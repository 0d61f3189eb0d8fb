"""spark-submit driver for checkpointed expectation-suite runs.

spark-submit takes a script file (not ``-m``), so this thin driver is
the production entrypoint; the engine itself ships as a zip on
``--py-files``, which puts it on sys.path for the driver AND every
executor — no repo checkout is needed on the cluster:

    zip -r ges.zip great_expectations_spark
    spark-submit --py-files ges.zip tools/submit_checkpoint.py \\
        --table /data/images_table \\
        --suite suite.json \\
        --state-dir /data/_validation_state \\
        --run-id nightly-2026-08-17 \\
        --group-col fmt

Re-running the same command after a failure resumes: completed
partition groups are skipped. Exit code: 0 success, 2 failed
expectations, 1 error. Verified end-to-end (real spark-submit, zip
import, resume) by tests/test_spark_submit.py.
"""

import sys

from great_expectations_spark.checkpoint.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
