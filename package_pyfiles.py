"""Build the ``--py-files`` zip for cluster submission.

The north-star deployment shape is ``spark-submit --py-files rkg_pkg.zip
spark_submit_app.py ...`` on a multi-executor cluster: the driver AND every
executor python resolve ``research_knowledge_graph_spark`` from the zip, so
no shared filesystem or image bake is needed. This builder is the ONE copy
of that packaging step — ``scaling_bench.py`` (local-cluster N-vs-4N
evidence) and ``tests/test_spark_submit.py`` (literal spark-submit E2E)
both import it.

Usage:
    python package_pyfiles.py [out.zip]        # default /tmp/rkg_pkg.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))


def build_pyfiles_zip(path: str | None = None) -> str:
    """Zip ``research_knowledge_graph_spark/`` (sans __pycache__) with
    repo-relative arcnames, deterministic walk order."""
    import tempfile

    path = path or os.path.join(tempfile.gettempdir(), "rkg_pkg.zip")
    pkg = os.path.join(REPO, "research_knowledge_graph_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            # exact-name prune (not a substring test on root): skips the
            # excluded trees instead of walking into them, and can't
            # wrongly drop a dir whose name merely contains the token
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for f in sorted(files):
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return path


if __name__ == "__main__":
    out = build_pyfiles_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
