"""Losses, metrics, schedules, checkpointing, misc helpers."""
