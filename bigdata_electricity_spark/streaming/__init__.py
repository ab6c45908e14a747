from .event_windows import streaming_session_window, streaming_tumbling_counts

__all__ = ["streaming_tumbling_counts", "streaming_session_window"]
