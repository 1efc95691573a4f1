"""Readers and writers (SURVEY §2.1 scans/sources/sinks)."""
