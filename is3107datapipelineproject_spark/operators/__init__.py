"""Operators: relational building blocks + engine-specific operators."""
