"""
Output/resource path resolution for the paper-reproduction modules.

Mirrors the behaviour of the reference `papers/local_path.py`: every figure
writer resolves its directory here instead of hardcoding one. Resolution
order per key: ``papers/settings.yaml`` if present and it defines the key,
otherwise a default under the repository root (``docs/figures`` for output,
``resources`` for input). The output directory is created on demand; the
resource directory is not — a missing input directory should fail loudly
rather than be silently created empty.
"""
from __future__ import annotations

import os

_PAPERS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_PAPERS_DIR)
_SETTINGS = os.path.join(_PAPERS_DIR, "settings.yaml")


def _from_settings(key: str) -> str | None:
    if not os.path.exists(_SETTINGS):
        return None
    try:
        import yaml  # imported only when the user opted in with a settings file
    except ImportError:
        return None
    with open(_SETTINGS) as f:
        data = yaml.safe_load(f) or {}
    value = data.get(key)
    return str(value) if value else None


def get_output_path() -> str:
    path = _from_settings("OUTPUT_PATH") or os.path.join(_REPO_ROOT, "docs", "figures")
    os.makedirs(path, exist_ok=True)
    return path


def get_resource_path() -> str:
    return _from_settings("RESOURCE_PATH") or os.path.join(_REPO_ROOT, "resources")
