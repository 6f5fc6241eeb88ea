"""North-rule packaging check: the pipeline must actually launch via
``spark-submit --py-files <package.zip> scripts/run_pipeline.py`` — the
same shipping mechanics a multi-executor cluster uses (only master/
memory change there).  One small end-to-end run, asserting the manifest
result the runner prints."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(spark_submit),
                    reason="spark-submit binary not available")
def test_spark_submit_py_files_runs_pipeline(tmp_path):
    sys.path.insert(0, REPO)
    from ai_log_analyzer_spark.packaging import package_zip
    zip_path = package_zip(str(tmp_path / "pkg.zip"))
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    out = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--pages", str(tmp_path / "pages"),
         "--workdir", str(tmp_path / "work"),
         "--generate", "4000"],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    # the runner prints the result manifest as JSON (possibly multi-line)
    payload = out.stdout[out.stdout.index("{"):]
    result = json.loads(payload[:payload.rindex("}") + 1])
    assert result["sink_counts"], "no per-sink counts in manifest"
    assert os.path.exists(result["catalog_path"])
    assert sum(c["n_rows"] for c in result["sink_counts"]) > 0
