"""Sources: dialected CSV, row-oriented edges, parquet catalog."""
