"""Pipelines: end-to-end ELT flows (the Sparkify reference replica)."""
