"""Custom source integrations (PySpark 4 Python Data Source API)."""

from .pyds import RangeHashDataSource, RangeStreamDataSource  # noqa: F401
