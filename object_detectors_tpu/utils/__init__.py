"""Utilities: config system, metric logging, progress ledger."""
