"""Auxiliary subsystems: serialization, telemetry."""

from . import serialization
from . import telemetry

__all__ = ["serialization", "telemetry"]
