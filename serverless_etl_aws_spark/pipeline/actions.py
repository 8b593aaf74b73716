"""Action dispatcher — the reference's s3_operations Lambda API surface
(reference: src/lambda_functions/s3_operations.py:75-118: routes
``{action: get_unprocessed | mark_processed | archive}`` events and
returns ``{statusCode, body}`` envelopes).

In the engine these operations are owned by the streaming checkpoint
(discovery/commit) and the archive util, so the dispatcher exists for
API familiarity during migration: a caller that spoke the Lambda's event
protocol can speak the same protocol here.

- ``get_unprocessed`` → files present in bronze but not yet in the
  checkpoint's file-source log (what the next ``run_once`` will drain).
- ``mark_processed`` → no-op by design: the checkpoint commits processing
  state transactionally with the write; manual marking would reintroduce
  the reference's crash window (bronze_to_silver.py:85-89). Returns an
  explanatory envelope rather than pretending to act.
- ``archive`` → :func:`..pipeline.archive.archive_file`.
"""

from __future__ import annotations

import json
import os

from .archive import archive_file


class ActionDispatcher:
    def __init__(self, bronze_dir: str, checkpoint_dir: str, archive_root: str):
        self.bronze_dir = bronze_dir
        self.checkpoint_dir = checkpoint_dir
        self.archive_root = archive_root

    # -- handlers ----------------------------------------------------------
    def get_unprocessed(self) -> list[str]:
        """Reference: S3FileProcessor.get_unprocessed_files
        (s3_operations.py:13-38) — tag-predicate listing becomes a diff of
        the bronze listing against the checkpoint's seen-files log."""
        seen = self._seen_paths()
        out = []
        for root, _dirs, files in os.walk(self.bronze_dir):
            for fn in files:
                if fn.startswith((".", "_")):
                    continue
                path = os.path.abspath(os.path.join(root, fn))
                if path not in seen:
                    out.append(path)
        return sorted(out)

    def archive(self, path: str) -> str:
        """Reference: archive_file (s3_operations.py:58-72)."""
        return archive_file(path, self.archive_root)

    def _seen_paths(self) -> set[str]:
        src_dir = os.path.join(self.checkpoint_dir, "sources", "0")
        seen: set[str] = set()
        if not os.path.isdir(src_dir):
            return seen
        for log in os.listdir(src_dir):
            p = os.path.join(src_dir, log)
            if not os.path.isfile(p) or log.startswith("."):
                continue
            with open(p, errors="ignore") as f:
                for line in f:
                    line = line.strip()
                    if line.startswith("{"):
                        try:
                            entry = json.loads(line)
                        except json.JSONDecodeError:
                            continue
                        path = entry.get("path", "")
                        if path.startswith("file:"):
                            path = path[len("file:"):]
                        if path:
                            seen.add(os.path.abspath(path))
        return seen

    # -- protocol ----------------------------------------------------------
    def handle(self, event: dict) -> dict:
        """Reference protocol: lambda_handler dispatch
        (s3_operations.py:97-115), same ``{statusCode, body}`` envelope."""
        action = event.get("action")
        try:
            if action == "get_unprocessed":
                return self._ok({"files": self.get_unprocessed()})
            if action == "mark_processed":
                return self._ok(
                    {
                        "noop": True,
                        "reason": "processing state is committed by the "
                        "streaming checkpoint atomically with the write",
                    }
                )
            if action == "archive":
                return self._ok({"archived_to": self.archive(event["key"])})
            return {
                "statusCode": 400,
                "body": json.dumps({"error": f"unknown action {action!r}"}),
            }
        except Exception as exc:  # mirror the reference's error envelope
            return {"statusCode": 500, "body": json.dumps({"error": str(exc)})}

    @staticmethod
    def _ok(payload: dict) -> dict:
        return {"statusCode": 200, "body": json.dumps(payload)}
