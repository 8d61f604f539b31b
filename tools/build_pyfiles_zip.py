"""Build the ``--py-files``-shippable archive of the ``linkgraph`` package.

The north rule mandates launching "via spark-submit --py-files on
multi-executor clusters" [BASELINE.json: north_star]; this produces the
artifact that claim refers to::

    python tools/build_pyfiles_zip.py [dest.zip]      # default dist/linkgraph.zip
    spark-submit --master spark://... --py-files dist/linkgraph.zip app.py cc ...

where ``app.py`` is the two-line launcher::

    from linkgraph.cli import main
    import sys; sys.exit(main())

(`spark-submit` takes a script file, not ``-m module``; the zip rides
along to every executor's PYTHONPATH.)  The package is pure Python with
no ``__file__``-relative data, so the zip is complete on its own —
tests/test_invariance.py::test_spark_submit_py_files_zip proves it by
running the CLI from a scratch directory with only the zip on the path.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build_zip(dest: str | Path) -> Path:
    """Zip ``linkgraph/**/*.py`` (package-rooted paths) into ``dest``."""
    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    sources = sorted((REPO / "linkgraph").rglob("*.py"))
    with zipfile.ZipFile(dest, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for f in sources:
            if "__pycache__" in f.parts:
                continue
            zf.write(f, f.relative_to(REPO))
    return dest


if __name__ == "__main__":
    out = build_zip(sys.argv[1] if len(sys.argv) > 1 else REPO / "dist/linkgraph.zip")
    print(out)
