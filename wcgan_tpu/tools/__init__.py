"""Conversion and inspection tools."""
