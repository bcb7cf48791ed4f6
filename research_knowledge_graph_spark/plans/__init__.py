"""Staged pipeline plans (checkpoint-resumable)."""
