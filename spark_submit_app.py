"""spark-submit application entry point.

    spark-submit --master <cluster> \
        --py-files /tmp/rkg_pkg.zip \
        spark_submit_app.py ingest --synthetic 10000 --workdir /data/kg

Thin by design: ``--py-files`` puts the package zip on every python's
sys.path (driver and executors), and the CLI's ``get_spark`` detects the
submit gateway (PYSPARK_GATEWAY_PORT) and respects the submitted
``--master`` instead of defaulting to local[N]. Build the zip with
``python package_pyfiles.py``.
"""

from research_knowledge_graph_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
