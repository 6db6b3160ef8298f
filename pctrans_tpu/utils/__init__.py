"""Utilities: monitoring, logging, seeding."""

from .monitor import Monitor, build_monitor
