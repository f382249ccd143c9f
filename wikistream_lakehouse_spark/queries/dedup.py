"""Placeholder — queries land in the next milestone."""
