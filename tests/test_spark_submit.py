"""The north-star submit path: `spark-submit --py-files tdigest_spark.zip`
must run the checkpointed quantiles job with the package imported FROM
THE ZIP (no repo checkout on the path) — the exact cluster deployment
shape."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_py_files_zip(spark, tmp_path):
    # tiny deterministic webpages table
    from tdigest_spark.sources.webpages import write_webpages

    inp = str(tmp_path / "wp")
    write_webpages(spark, 300, inp)

    # package the library exactly as the docstring instructs
    zpath = str(tmp_path / "tdigest_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(os.path.join(REPO, "tdigest_spark")):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    # copy the job OUT of the repo so its sys.path fallback cannot find
    # the checkout — the import must resolve from --py-files
    job = str(tmp_path / "job.py")
    shutil.copy(os.path.join(REPO, "jobs", "webpages_quantiles_job.py"), job)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_DRIVER_MEM"] = "2g"
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            job,
            "--input", inp,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--delta", "100",
            "--qs", "0.5,0.9",
        ],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["rows"] == 300
    assert out["splits_built"] >= 1
    assert out["quantiles"]["0.5"] > 0
