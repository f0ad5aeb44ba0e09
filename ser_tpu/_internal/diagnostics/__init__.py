"""Diagnostics service backing doctor + startup preflight."""
