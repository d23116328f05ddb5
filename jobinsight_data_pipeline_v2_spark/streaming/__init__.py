"""Structured Streaming surface (net-new beyond reference parity)."""
