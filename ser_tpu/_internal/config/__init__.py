"""Configuration subsystem: schema, env capture, builder, ambient bootstrap."""
