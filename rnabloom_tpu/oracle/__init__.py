"""Scalar reference-semantics oracle (see refsim.py)."""
