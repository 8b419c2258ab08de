"""Client-facing API (the clean version of the reference's api/ intent)."""

from .client import SubnetClient

__all__ = ["SubnetClient"]
