"""``python -m rayindex.search`` — query CLI (see rayindex.cli)."""

from __future__ import annotations

import sys

from rayindex.cli import main_search

if __name__ == "__main__":  # pragma: no cover
    sys.exit(main_search())
