"""The literal north-rule deployment path: ``spark-submit --py-files
rkg_pkg.zip spark_submit_app.py ingest ...`` must run the full
KG-construction pipeline end to end with the package resolved FROM THE
ZIP — the app script is copied outside the repo so neither sys.path[0]
(the script's directory) nor the CWD can satisfy the import, exactly the
situation on a real cluster where executors have only the shipped zip."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_e2e(tmp_path):
    sys.path.insert(0, REPO)
    from package_pyfiles import build_pyfiles_zip

    zip_path = build_pyfiles_zip(str(tmp_path / "rkg_pkg.zip"))
    app = str(tmp_path / "app.py")
    shutil.copy(os.path.join(REPO, "spark_submit_app.py"), app)
    workdir = str(tmp_path / "kg")
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # only --py-files may provide the package
    out = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.driver.memory=4g",
            "--py-files", zip_path,
            app,
            "ingest", "--synthetic", "300", "--workdir", workdir,
        ],
        cwd=str(tmp_path),  # neutral CWD: the repo is nowhere on sys.path
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    # the pipeline committed its tables
    for table in ("nodes", "edges", "docs", "_manifest.json"):
        assert os.path.exists(os.path.join(workdir, table)), table
    # and they are readable, non-empty parquet commits
    import duckdb

    n_nodes = duckdb.sql(
        f"SELECT count(*) FROM read_parquet("
        f"'{workdir}/nodes/snap-*/node_type=*/*.parquet')"
    ).fetchone()[0]
    assert n_nodes > 0
