"""Shared host-side primitives: audio IO, logging, timeline, subtitles."""
