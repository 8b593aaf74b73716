"""Run-report hook — the reference's SNS notification side-channel
(reference: src/lambda_functions/fetch_raw_data.py:97-111, publish call
sites :130/:137/:156/:162/:168) as an in-process observer. Swap the sink
for a real SNS/Slack/webhook client in production; the pipeline only sees
``notify``."""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

log = logging.getLogger("serverless_etl_aws_spark.pipeline")


@dataclass
class RunReport:
    events: list[tuple[str, str]] = field(default_factory=list)

    def notify(self, subject: str, message: str) -> None:
        self.events.append((subject, message))
        log.info("[%s] %s", subject, message)
