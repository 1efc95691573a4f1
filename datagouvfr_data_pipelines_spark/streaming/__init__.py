"""Structured Streaming veneer (SURVEY §2.9): AvailableNow over batch ops."""
