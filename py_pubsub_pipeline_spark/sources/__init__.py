"""Custom Python DataSources (PySpark 4 datasource API)."""

from .pubsub import PubSubDirDataSource, publish  # noqa: F401
