"""Vectorized ops: geometry primitives and the layout cost terms."""
