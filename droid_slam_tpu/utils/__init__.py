"""Utilities: visualization/export, logging."""
