"""Ingestion sources: CSV->Parquet conversion, parquet folder tooling."""
