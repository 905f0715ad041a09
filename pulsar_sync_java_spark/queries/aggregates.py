"""Placeholder — filled in as the milestone lands."""
