from .managed import ManagedTable

__all__ = ["ManagedTable"]
