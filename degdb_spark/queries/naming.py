"""Contract-index naming: the ONE definition of the sf-dir name
segment shared by every name builder AND its retirement filter. A
drifted copy in either place makes retirement silently stop matching
and dead index builds accrete (the failure this module exists to
prevent)."""

from __future__ import annotations

import hashlib


def sf_segment(sf_dir: str) -> str:
    """8-hex sf-dir discriminator embedded in contract-index table
    names, so stale-build retirement can be scoped per sf dir."""
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]
