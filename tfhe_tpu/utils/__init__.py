"""Auxiliary subsystems: serialization, telemetry."""

from . import serialization

__all__ = ["serialization"]
