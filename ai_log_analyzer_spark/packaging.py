"""spark-submit --py-files packaging (north rule; SURVEY.md §7 M6).

``package_zip()`` builds the exact artifact you would pass to
``spark-submit --py-files``; ``build_session`` ships it via
``addPyFile`` so executor Python workers can import the package no
matter what the driver's cwd is — identical mechanics on a real
multi-executor cluster and in local mode.
"""

from __future__ import annotations

import os
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)


def package_zip(out_path: str | None = None) -> str:
    if out_path is None:
        import tempfile
        out_path = os.path.join(tempfile.gettempdir(),
                                f"{_PKG_NAME}-pyfiles.zip")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(_PKG_NAME, os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    return out_path
