"""Build the spark-submit artifact: cognee_spark.zip for --py-files.

    python make_package.py [dest_dir]
    spark-submit --py-files dist/cognee_spark.zip your_job.py

(`cognee_spark.session.get_spark` also ships the package automatically via
addPyFile for programmatic sessions; this script produces the explicit
artifact for cluster submission.)
"""

from __future__ import annotations

import os
import shutil
import sys


def build(dest_dir: str = "dist") -> str:
    repo = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(dest_dir, exist_ok=True)
    archive = shutil.make_archive(
        os.path.join(dest_dir, "cognee_spark"), "zip", repo, "cognee_spark"
    )
    return archive


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist"))
