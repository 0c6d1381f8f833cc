"""Shared CLI/server plumbing (common/ analogue)."""
