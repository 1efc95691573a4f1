"""Composable DataFrame -> DataFrame operator library (SURVEY §2)."""
