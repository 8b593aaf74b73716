"""Archive util — date-partitioned move of processed bronze files.

Reference: archive_file copies to ``archive/YYYY/MM/DD/<name>`` then
deletes the original (src/lambda_functions/s3_operations.py:58-72; the
pipeline call site is commented out at bronze_to_silver.py:91-96 — the
engine keeps the util available but likewise does not wire it into ingest,
because the streaming checkpoint already guarantees a file is never
re-processed; archival is a retention decision, not a correctness one).
"""

from __future__ import annotations

import os
import shutil
from datetime import date


def archive_file(path: str, archive_root: str, on: date | None = None) -> str:
    """Move ``path`` to ``{archive_root}/YYYY/MM/DD/{basename}``."""
    d = on or date.today()
    dest_dir = os.path.join(
        archive_root, f"{d.year:04d}", f"{d.month:02d}", f"{d.day:02d}"
    )
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, os.path.basename(path))
    shutil.move(path, dest)
    return dest
