"""Utilities: metrics, checkpointing, logging, configs."""
