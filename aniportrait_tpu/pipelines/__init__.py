from .context import get_context_scheduler, uniform_context_windows

__all__ = ["get_context_scheduler", "uniform_context_windows"]
