"""Transcription subsystem: extractor facade + backend adapters."""
