"""Asset path resolution.

Looks for scene assets (OBJ models, spectral CSVs, sky tables, images) in:
  1. $TIRAY_ASSETS if set
  2. <repo>/assets  (populated by tools/vendor_assets.py — self-contained)
  3. /root/reference  (the mounted read-only reference data, if present;
     disabled by TIRAY_NO_REFERENCE=1 to prove self-containedness)
"""

import os

_REPO_ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "assets")
_REFERENCE = "/root/reference"


def asset_path(rel: str) -> str:
    """Resolve a relative asset path like 'model/cornell_box.obj'."""
    roots = []
    env = os.environ.get("TIRAY_ASSETS")
    if env:
        roots.append(env)
    roots.append(_REPO_ASSETS)
    if not os.environ.get("TIRAY_NO_REFERENCE"):
        roots.append(_REFERENCE)
    for root in roots:
        p = os.path.join(root, rel)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"asset {rel!r} not found under any of {roots}")
