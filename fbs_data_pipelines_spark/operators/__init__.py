"""Relational + pipeline operators (SURVEY §2.4–2.6, §2.11, and the
beyond-reference dedup/similarity/multimodal surface)."""
