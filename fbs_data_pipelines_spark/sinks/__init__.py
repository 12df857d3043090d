"""Sinks: parquet/table writers + driver-bound row-payload edges."""
