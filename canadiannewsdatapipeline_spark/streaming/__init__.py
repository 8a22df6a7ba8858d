from .ingest import streaming_file_ingest, windowed_event_counts

__all__ = ["streaming_file_ingest", "windowed_event_counts"]
