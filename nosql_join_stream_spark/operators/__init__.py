"""Operators: reference-parity (join, log, combinators) and
beyond-reference scale operators (dedup, similarity, retrieval,
sampling, text, multimodal)."""
