"""Repo-relative asset resolution.

Committed assets (demo checkpoints, the Set5 calibration/eval images) are
addressed by repo-relative paths in specs and defaults.  Resolving them
against the CWD alone makes every default silently break when the CLI or
library is used from any other working directory — the r3 review found
three call sites with that bug class.  This helper is the single policy:
try the CWD (a repo-root invocation, or a caller's own copy of the asset),
then the checkout that owns this package.
"""

from __future__ import annotations

import os

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
#: the checkout containing the image_enhance_keras_tpu package
REPO_ROOT = os.path.dirname(_PKG_ROOT)


def find_repo_asset(rel: str | None) -> str | None:
    """Existing path for a repo-relative asset, or None.

    Absolute paths and CWD-relative hits are returned as-is; otherwise the
    path is resolved against the repository root of this checkout."""
    if not rel:
        return None
    if os.path.exists(rel):
        return rel
    if os.path.isabs(rel):
        return None
    cand = os.path.join(REPO_ROOT, rel)
    return cand if os.path.exists(cand) else None
