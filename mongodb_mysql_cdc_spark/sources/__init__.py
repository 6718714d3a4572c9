"""Sources & sinks: batch parquet/json/csv readers with declared schemas,
CDC envelope synthesis/parsing, and streaming file-replay sources."""
