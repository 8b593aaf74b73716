"""Partition-level watermark store — DynamoDB item → local JSON state.

Semantics preserved from the reference (deliberately, SURVEY.md §7 "hard
parts"): the gate is a *string* comparison ``last >= year_month`` on
zero-padded ``YYYY-MM`` (reference: src/lambda_functions/fetch_raw_data.py:135
— lexicographic order equals chronological order for this pinned format).
The stored record keeps the reference's shape
``{id: "last_processed", year_month, updated_at}``
(fetch_raw_data.py:90; table def terraform/main.tf:254-263).

At cluster scale this file lives on the object store next to the zone; it is
a single tiny object written atomically (write-temp + rename), not a
database dependency.
"""

from __future__ import annotations

import json
import os
import re
from datetime import datetime, timezone

_YM = re.compile(r"^\d{4}-\d{2}$")


class WatermarkStore:
    def __init__(self, state_path: str) -> None:
        self.state_path = state_path

    def get_last_processed(self) -> str | None:
        """Reference: get_last_processed_date (fetch_raw_data.py:56-73)."""
        if not os.path.exists(self.state_path):
            return None
        with open(self.state_path) as f:
            return json.load(f).get("year_month")

    def update_last_processed(self, year_month: str) -> None:
        """Reference: update_last_processed_date (fetch_raw_data.py:76-94)."""
        if not _YM.match(year_month):
            raise ValueError(f"year_month must be YYYY-MM, got {year_month!r}")
        record = {
            "id": "last_processed",
            "year_month": year_month,
            "updated_at": datetime.now(timezone.utc).isoformat(),
        }
        tmp = self.state_path + ".tmp"
        os.makedirs(os.path.dirname(self.state_path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, self.state_path)

    def should_skip(self, year_month: str) -> bool:
        """Month-level idempotency gate (reference: fetch_raw_data.py:134-138):
        skip when ``last_processed >= year_month`` (string compare on the
        pinned format)."""
        if not _YM.match(year_month):
            raise ValueError(f"year_month must be YYYY-MM, got {year_month!r}")
        last = self.get_last_processed()
        return last is not None and last >= year_month
