"""Auxiliary subsystems: serialization, telemetry, restartable jobs."""

from . import jobs
from . import serialization
from . import telemetry

__all__ = ["jobs", "serialization", "telemetry"]
