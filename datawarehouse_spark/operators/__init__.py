"""Reusable operator implementations (dedup, similarity, text, skew)."""
