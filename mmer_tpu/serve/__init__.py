"""Serving: inference engine + HTTP API (reference back-end parity)."""
